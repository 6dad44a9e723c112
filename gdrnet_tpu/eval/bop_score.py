"""BOP score computation over saved results — in-process replacement for the
reference's two-level subprocess fan-out (lib/pysixd/scripts/
eval_pose_results_more.py:200-310 dispatching eval_calc_errors.py +
eval_calc_scores.py per error type/threshold).

Supported error types (error matrix, eval_pose_results_more.py:41-94):
  ad / add / adi            recall at 0.02/0.05/0.10 x diameter
  AUCad / AUCadd / AUCadi   mean recall over thresholds 1..10 cm (:79-83)
  ABSad / ABSadd / ABSadi   recall at the absolute 2 cm threshold (:73-77)
  re / te / rete / proj     recall at (2,5,10) deg / cm / px (not sym-aware)
  reS / teS / reteS / projS sym-aware variants (min over the symmetry set)
  mssd / mspd               BOP19 recalls averaged over their threshold grids
  vsd                       BOP19 recall grid (needs depth_test via vsd_fn)

`score_results` matches estimates to GT by (scene_id, im_id, obj_id) with
n_top semantics (N_TOP=1: highest-score estimate per GT object).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from gdrnet_tpu.eval import pose_errors as PE

BOP19_MSSD_THRESHOLDS = np.arange(0.05, 0.51, 0.05)  # x diameter
BOP19_MSPD_THRESHOLDS = np.arange(5, 51, 5)  # x r=w/640 px
BOP19_VSD_TAUS = np.arange(0.05, 0.51, 0.05)


def match_estimates_to_gt(results: list[dict], gts: list[dict],
                          n_top: int = 1, precision: bool = False
                          ) -> list[tuple[dict, dict]]:
    """results: BOP rows (R, t in mm); gts: records with R, t (m), K.

    recall mode (default): one pair per GT (missing estimate -> (None, gt)).
    precision mode (reference _eval_predictions_precision,
    gdrn_custom_evaluator.py:672): one pair per ESTIMATE — every prediction
    is judged against its image's GT of the same object; extra predictions
    without GT are dropped (they have no pose to compare against)."""
    gt_by_key = defaultdict(list)
    for g in gts:
        gt_by_key[(g["scene_id"], g["im_id"], g["obj_id"])].append(g)
    est_by_key = defaultdict(list)
    for r in results:
        est_by_key[(r["scene_id"], r["im_id"], r["obj_id"])].append(r)
    pairs = []
    if precision:
        for key, ests in est_by_key.items():
            gt_list = gt_by_key.get(key, [])
            if not gt_list:
                continue
            for est in sorted(ests, key=lambda e: -e.get("score", 1.0)):
                pairs.append((est, gt_list[0]))
        return pairs
    for key, gt_list in gt_by_key.items():
        ests = sorted(est_by_key.get(key, []), key=lambda e: -e.get("score", 1.0))
        take = len(gt_list) if n_top <= 0 else min(n_top, len(gt_list))
        for gt, est in zip(gt_list[:take], ests[:take]):
            pairs.append((est, gt))
        # unmatched gts count as failures via the caller's recall denominators
        for gt in gt_list[len(ests):take]:
            pairs.append((None, gt))
    return pairs


def _stack_pairs(pairs, id2obj):
    by_obj = defaultdict(lambda: {"Re": [], "te_": [], "Rg": [], "tg": [],
                                  "K": [], "miss": 0})
    for est, gt in pairs:
        name = id2obj[gt["obj_id"]]
        if est is None:
            by_obj[name]["miss"] += 1
            continue
        by_obj[name]["Re"].append(np.asarray(est["R"], np.float32))
        by_obj[name]["te_"].append(np.asarray(est["t"], np.float32) / 1000.0)
        by_obj[name]["Rg"].append(gt["R"])
        by_obj[name]["tg"].append(gt["t"])
        by_obj[name]["K"].append(gt["K"])
    return by_obj


def score_results(results: list[dict], gts: list[dict], models,
                  error_types: str = "ad,rete,re,te,proj",
                  sym_objs: list[str] | None = None, n_top: int = 1,
                  image_width: int = 640, precision: bool = False) -> dict:
    """models: ObjectModels (points/diameters/sym_rots). Returns
    {error_type: {obj: recall(s)} + {"avg": ...}}. precision=True reproduces
    the reference's VAL.EVAL_PRECISION mode (per-estimate denominators)."""
    id2obj = models.meta.id2obj
    sym_objs = sym_objs if sym_objs is not None else models.meta.sym_objects
    pairs = match_estimates_to_gt(results, gts, n_top, precision=precision)
    by_obj = _stack_pairs(pairs, id2obj)
    types = [t.strip() for t in error_types.split(",") if t.strip()]
    out: dict = {}

    for etype in types:
        per_obj: dict = {}
        for name, d in by_obj.items():
            n_total = len(d["Rg"]) + d["miss"]
            if len(d["Rg"]) == 0:
                per_obj[name] = 0.0
                continue
            Re = np.stack(d["Re"]); te_ = np.stack(d["te_"])
            Rg = np.stack(d["Rg"]); tg = np.stack(d["tg"])
            K = np.stack(d["K"])
            pts = models.points[name]
            dia = models.diameters[name]
            B = len(Re)

            is_sym = name in sym_objs
            if etype.endswith(("add",)):
                err = np.asarray(PE.add_batch(Re, te_, Rg, tg, pts))
            elif etype.endswith("adi"):
                err = np.asarray(PE.adi_batch(Re, te_, Rg, tg, pts))
            elif etype.endswith("ad"):
                err = np.asarray((PE.adi_batch if is_sym else PE.add_batch)(
                    Re, te_, Rg, tg, pts))
            elif etype in ("re", "te", "rete", "proj",
                           "reS", "teS", "reteS", "projS"):
                # plain types are NOT sym-aware; the S variants take the min
                # over the symmetry set per error independently (reference
                # eval_calc_errors.py:408-450, pose_error.re_sym/te_sym/
                # arp_2d_sym:184-234 — min over syms, not closest-by-angle).
                # Our model store keeps rotational syms only (sym t == 0 for
                # the lm/lmo/ycbv discrete symmetries), so teS == te.
                sym_aware = etype.endswith("S")
                base = etype[:-1] if sym_aware else etype
                srots = models.sym_rots.get(name) if (sym_aware and is_sym) else None
                if srots is not None:
                    sym_set = np.concatenate(
                        [np.eye(3, dtype=np.float32)[None], srots], axis=0)
                else:
                    sym_set = np.eye(3, dtype=np.float32)[None]
                Rg_syms = np.einsum("bij,sjk->sbik", Rg, sym_set)
                t_err = np.asarray(PE.te_batch(te_, tg))
                if base in ("re", "rete"):
                    r_err = np.min(np.stack(
                        [np.asarray(PE.re_batch(Re, Rg_syms[s]))
                         for s in range(len(sym_set))]), axis=0)
                if base == "re":
                    err = r_err
                elif base == "te":
                    err = t_err
                elif base == "proj":
                    err = np.min(np.stack(
                        [np.asarray(PE.proj_batch(Re, te_, Rg_syms[s], tg, K, pts))
                         for s in range(len(sym_set))]), axis=0)
                else:  # rete: joint thresholds on independently sym-min'd errs
                    rec = [float(np.sum((r_err < a) & (t_err < b))) / n_total
                           for a, b in ((2, 0.02), (5, 0.05), (10, 0.10))]
                    per_obj[name] = rec
                    continue
            elif etype == "mssd":
                sym, mask = _sym_arrays(models, name, B)
                err = np.asarray(PE.mssd_batch(Re, te_, Rg, tg, pts, sym, mask))
                rec = float(np.mean([np.sum(err < thr * dia) / n_total
                                     for thr in BOP19_MSSD_THRESHOLDS]))
                per_obj[name] = rec
                continue
            elif etype == "mspd":
                sym, mask = _sym_arrays(models, name, B)
                err = np.asarray(PE.mspd_batch(Re, te_, Rg, tg, K, pts, sym, mask))
                r = image_width / 640.0
                rec = float(np.mean([np.sum(err < thr * r) / n_total
                                     for thr in BOP19_MSPD_THRESHOLDS]))
                per_obj[name] = rec
                continue
            else:
                raise ValueError(f"unknown error type: {etype}")

            if etype.startswith("AUC"):
                # reference AUC = mean recall over 10 thresholds 1..10 cm
                # (eval_pose_results_more.py:79-83 linspace(1, 10, 10) cm)
                per_obj[name] = float(np.mean(
                    [np.sum(err < thr) / n_total
                     for thr in np.linspace(0.01, 0.10, 10)]))
            elif etype.startswith("ABS"):
                # reference ABS = recall at one absolute 2 cm threshold
                # (eval_pose_results_more.py:73-77 correct_th [[2]] cm)
                per_obj[name] = float(np.sum(err < 0.02) / n_total)
            elif etype in ("re", "reS"):
                per_obj[name] = [float(np.sum(err < thr)) / n_total for thr in (2, 5, 10)]
            elif etype in ("te", "teS"):
                per_obj[name] = [float(np.sum(err < thr)) / n_total
                                 for thr in (0.02, 0.05, 0.10)]
            elif etype in ("proj", "projS"):
                per_obj[name] = [float(np.sum(err < thr)) / n_total for thr in (2, 5, 10)]
            else:  # ad / add / adi family
                per_obj[name] = [float(np.sum(err < f * dia)) / n_total
                                 for f in (0.02, 0.05, 0.10)]
        vals = [np.mean(v) if isinstance(v, list) else v for v in per_obj.values()]
        per_obj["avg"] = float(np.mean(vals)) if vals else 0.0
        out[etype] = per_obj
    return out


def _sym_arrays(models, name: str, batch: int):
    srots = models.sym_rots.get(name)
    if srots is None:
        sym = np.tile(np.eye(3, dtype=np.float32), (batch, 1, 1, 1))
        return sym, np.ones((batch, 1), bool)
    k = srots.shape[0] + 1
    sym = np.tile(np.eye(3, dtype=np.float32), (batch, k, 1, 1))
    sym[:, 1:] = srots[None]
    return sym, np.ones((batch, k), bool)


def bop19_average_recall(scores: dict) -> float:
    """AR = mean(AR_vsd, AR_mssd, AR_mspd) when present, else mean of
    whatever recall averages exist (eval_pose_results_more.py:289-310)."""
    keys = [k for k in ("vsd", "mssd", "mspd") if k in scores]
    if not keys:
        keys = list(scores)
    return float(np.mean([scores[k]["avg"] for k in keys]))
