"""BOP score orchestration + VSD tests on synthetic estimates."""

import numpy as np
import pytest

from gdrnet_tpu.eval.bop_score import (
    score_results, match_estimates_to_gt, bop19_average_recall)
from gdrnet_tpu.eval.vsd import vsd, vsd_from_depths, depth_to_dist
from gdrnet_tpu.ops.rasterizer import render_xyz

from fixture_bop import build_fixture_dataset


class _Models:
    """Minimal ObjectModels stand-in."""

    def __init__(self, meta, points, diameters, sym_rots):
        self.meta = meta
        self.points = points
        self.diameters = diameters
        self.sym_rots = sym_rots


@pytest.fixture(scope="module")
def scored_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("bop_score")
    meta = build_fixture_dataset(str(root), n_images=3, seed=21)
    from gdrnet_tpu.data.bop import load_bop_scene_dicts
    from gdrnet_tpu.data.model_store import ObjectModels

    records = load_bop_scene_dicts(meta, "test")
    models = ObjectModels(meta, num_pm_points=128)
    return meta, records, models


def _results_from_gts(gts, noise_r=0.0, noise_t=0.0, rng=None):
    out = []
    for g in gts:
        R = g["R"].copy()
        t = g["t"].copy()
        if noise_r > 0:
            ax = rng.randn(3); ax /= np.linalg.norm(ax)
            a = np.radians(noise_r)
            Kx = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
            R = (np.eye(3) + np.sin(a) * Kx + (1 - np.cos(a)) * Kx @ Kx) @ R
        if noise_t > 0:
            t = t + rng.randn(3) * noise_t
        out.append({"scene_id": g["scene_id"], "im_id": g["im_id"],
                    "obj_id": g["obj_id"], "score": 1.0, "R": R, "t": t * 1000.0})
    return out


def test_perfect_estimates_score_one(scored_setup):
    meta, records, models = scored_setup
    results = _results_from_gts(records)
    scores = score_results(results, records,
                           models, "ad,add,adi,rete,re,te,proj,mssd,mspd,AUCad")
    for etype in ("ad", "add", "adi", "mssd", "mspd"):
        assert scores[etype]["avg"] == pytest.approx(1.0), etype
    assert scores["AUCad"]["avg"] > 0.99
    assert bop19_average_recall(scores) == pytest.approx(1.0)


def test_bad_estimates_score_low(scored_setup, rng):
    meta, records, models = scored_setup
    results = _results_from_gts(records, noise_r=90.0, noise_t=0.3, rng=rng)
    scores = score_results(results, records, models, "ad,mssd,re")
    assert scores["ad"]["avg"] < 0.3
    assert scores["mssd"]["avg"] < 0.5


def test_missing_estimates_counted(scored_setup):
    meta, records, models = scored_setup
    results = _results_from_gts(records)[: len(records) // 2]
    pairs = match_estimates_to_gt(results, records)
    assert sum(1 for e, _ in pairs if e is None) == len(records) - len(results)
    scores = score_results(results, records, models, "ad")
    assert 0.3 < scores["ad"]["avg"] < 0.8


def test_vsd_perfect_and_shifted(scored_setup):
    meta, records, models = scored_setup
    from gdrnet_tpu.data.ply import load_ply

    rec = records[0]
    ply = load_ply(meta.model_path(rec["obj_id"]), vertex_scale=0.001)
    verts, faces = ply["pts"], ply["faces"]
    depth_gt, _ = render_xyz(verts, faces, rec["K"], rec["R"], rec["t"],
                             height=meta.height, width=meta.width)
    depth_test = np.asarray(depth_gt)  # scene depth = object only

    dia = models.diameters[meta.id2obj[rec["obj_id"]]]
    errs = vsd(rec["R"], rec["t"], rec["R"], rec["t"], depth_test, rec["K"],
               verts, faces, diameter=dia)
    assert np.all(errs < 0.01)  # perfect pose -> ~0 everywhere

    # 5 cm z-shift: large visible discrepancy at small taus
    t_bad = rec["t"] + np.array([0, 0, 0.05], np.float32)
    errs_bad = vsd(rec["R"], t_bad, rec["R"], rec["t"], depth_test, rec["K"],
                   verts, faces, diameter=dia)
    assert errs_bad[0] > 0.5  # tau=0.05*dia << 5cm shift
    assert errs_bad[0] >= errs_bad[-1] - 1e-6  # monotone non-increasing in tau


def test_vsd_through_score_results(scored_setup):
    """vsd as a first-class ERROR_TYPE: depth_path-carrying records feed
    score_results and AR_bop19 = mean(vsd, mssd, mspd). Perfect estimates
    score 1.0; missing estimates are all-threshold failures."""
    meta, records, models = scored_setup
    assert all("depth_path" in r for r in records)  # fixture writes depth/
    results = _results_from_gts(records)
    scores = score_results(results, records, models, "vsd,mssd,mspd")
    assert scores["vsd"]["avg"] == pytest.approx(1.0)
    assert bop19_average_recall(scores) == pytest.approx(1.0)

    # drop the estimates of one object entirely: its vsd recall is 0 (the
    # all-ones miss rows fail every threshold), the other stays 1.0
    kept = [r for r in results if r["obj_id"] == 1]
    s2 = score_results(kept, records, models, "vsd")
    assert s2["vsd"]["cube"] == pytest.approx(1.0)
    assert s2["vsd"]["brick"] == pytest.approx(0.0)
    assert s2["vsd"]["avg"] == pytest.approx(0.5)


def test_vsd_matches_numpy_reference(scored_setup):
    """vsd_from_depths vs a direct numpy transcription of the reference
    pose_error.vsd (lib/pysixd/pose_error.py:22-129, visibility.py:44-71,
    bop19 mode) on the fixture's real scene depth (includes cross-object
    occlusion in d_test) with a perturbed estimate."""
    meta, records, models = scored_setup
    from gdrnet_tpu.data.io import load_depth

    rec = next(r for r in records if r["obj_id"] == 1)
    name = meta.id2obj[rec["obj_id"]]
    verts, faces = models.full_points[name], models.faces[name]
    dia = models.diameters[name]
    d_test = load_depth(rec["depth_path"], rec.get("depth_scale", 1.0))

    ax = np.array([0.3, -0.5, 0.8]); ax /= np.linalg.norm(ax)
    a = np.radians(10.0)
    Kx = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
    R_est = ((np.eye(3) + np.sin(a) * Kx + (1 - np.cos(a)) * Kx @ Kx)
             @ rec["R"]).astype(np.float32)
    t_est = rec["t"] + np.array([0.01, 0.0, 0.02], np.float32)

    taus = np.arange(0.05, 0.51, 0.05).astype(np.float32)
    delta = 15.0 / 1000.0
    errs = vsd(R_est, t_est, rec["R"], rec["t"], d_test, rec["K"],
               verts, faces, delta=delta, taus=taus, diameter=dia)

    # ---- numpy twin of the reference (same renders, f64 math) ----
    def dist_im(depth, K):
        h, w = depth.shape
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
        xn = (xs - K[0, 2]) / K[0, 0]
        yn = (ys - K[1, 2]) / K[1, 1]
        return depth * np.sqrt(xn * xn + yn * yn + 1.0)

    de = np.asarray(render_xyz(verts, faces, rec["K"], R_est, t_est,
                               height=meta.height, width=meta.width)[0])
    dg = np.asarray(render_xyz(verts, faces, rec["K"], rec["R"], rec["t"],
                               height=meta.height, width=meta.width)[0])
    dt_, de_, dg_ = dist_im(d_test, rec["K"]), dist_im(de, rec["K"]), \
        dist_im(dg, rec["K"])
    visib_gt = ((dg_ - dt_ <= delta) | (dt_ == 0)) & (dg_ > 0)
    visib_est = (((de_ - dt_ <= delta) | (dt_ == 0)) & (de_ > 0)) \
        | (visib_gt & (de_ > 0))
    inter = visib_gt & visib_est
    union = visib_gt | visib_est
    comp = union.sum() - inter.sum()
    dists = np.abs(dg_[inter] - de_[inter]) / dia
    errs_np = [(np.sum(dists >= tau) + comp) / union.sum() for tau in taus]

    assert errs.shape == (len(taus),)
    assert errs == pytest.approx(errs_np, abs=1e-4)
    assert errs[0] > 0.1  # the perturbation is actually visible


def test_vsd_requires_depth(scored_setup):
    meta, records, models = scored_setup
    results = _results_from_gts(records)
    stripped = [{k: v for k, v in r.items()
                 if k not in ("depth_path", "depth_scale")} for r in records]
    with pytest.raises(ValueError, match="depth"):
        score_results(results, stripped, models, "vsd")


def test_depth_to_dist_center_pixel():
    K = np.array([[280.0, 0, 16], [0, 280.0, 12], [0, 0, 1]], np.float32)
    depth = np.zeros((24, 32), np.float32)
    depth[12, 16] = 2.0
    dist = np.asarray(depth_to_dist(depth, K))
    assert dist[12, 16] == pytest.approx(2.0, abs=1e-5)  # principal ray


def test_precision_mode(scored_setup):
    meta, records, models = scored_setup
    # duplicate estimates: one perfect + one garbage per GT
    good = _results_from_gts(records)
    bad = [dict(r, R=np.eye(3), t=r["t"] + 500.0, score=0.5) for r in good]
    scores_r = score_results(good + bad, records, models, "ad")
    scores_p = score_results(good + bad, records, models, "ad", precision=True)
    # recall with n_top=1 keeps only the best-scoring estimate per gt -> 1.0
    assert scores_r["ad"]["avg"] == pytest.approx(1.0)
    # precision judges every estimate -> half are garbage
    assert 0.3 < scores_p["ad"]["avg"] < 0.7


def test_cou_mask_and_bb_golden():
    """cou_mask/cou_bb vs the reference formulas (pose_error.py:466-485,
    :534-544 with misc.iou :809-837) on hand-built cases."""
    from gdrnet_tpu.eval.pose_errors import cou_mask_batch, cou_bb_batch

    a = np.zeros((8, 8), bool); a[2:6, 2:6] = True   # 16 px
    b = np.zeros((8, 8), bool); b[4:8, 4:8] = True   # 16 px, 4 overlap
    errs = np.asarray(cou_mask_batch(
        np.stack([a, a, a, np.zeros_like(a)]),
        np.stack([a, b, np.zeros_like(a), np.zeros_like(a)])))
    assert errs == pytest.approx([0.0, 1 - 4 / 28, 1.0, 1.0], abs=1e-6)

    bb = np.array([[0, 0, 4, 4], [0, 0, 4, 4], [0, 0, 4, 4]], np.float32)
    bb2 = np.array([[0, 0, 4, 4], [2, 2, 4, 4], [10, 10, 4, 4]], np.float32)
    errs = np.asarray(cou_bb_batch(bb, bb2))
    assert errs == pytest.approx([0.0, 1 - 4 / 28, 1.0], abs=1e-6)


def test_cus_and_cou_bb_proj(scored_setup):
    """Rendered-silhouette CoU: 0 at the true pose, large when shifted."""
    meta, records, models = scored_setup
    from gdrnet_tpu.data.ply import load_ply
    from gdrnet_tpu.eval.vsd import cus, cou_bb_proj

    rec = records[0]
    ply = load_ply(meta.model_path(rec["obj_id"]), vertex_scale=0.001)
    verts, faces = ply["pts"], ply["faces"]
    kw = dict(height=meta.height, width=meta.width)
    assert cus(rec["R"], rec["t"], rec["R"], rec["t"], rec["K"],
               verts, faces, **kw) == pytest.approx(0.0, abs=1e-6)
    assert cou_bb_proj(rec["R"], rec["t"], rec["R"], rec["t"], rec["K"],
                       verts, faces, **kw) == pytest.approx(0.0, abs=1e-6)
    t_bad = rec["t"] + np.array([0.15, 0.0, 0.0], np.float32)
    assert cus(rec["R"], t_bad, rec["R"], rec["t"], rec["K"],
               verts, faces, **kw) > 0.5


def test_match_poses_greedy_protocol():
    """BOP greedy matching (pose_matching.py:9-91): score order, unique GT,
    per-element thresholds, valid mask."""
    from gdrnet_tpu.eval.pose_matching import match_poses

    errs = [
        {"est_id": 0, "score": 0.9, "errors": {0: [0.05], 1: [0.01]}},
        {"est_id": 1, "score": 0.8, "errors": {0: [0.02], 1: [0.20]}},
        {"est_id": 2, "score": 0.7, "errors": {0: [0.01], 1: [0.01]}},
    ]
    m = match_poses(errs, error_ths=[0.1])
    # est 0 (best score) grabs gt 1 (its lowest error), est 1 then takes gt 0;
    # est 2 finds both gts taken -> unmatched
    got = {r["est_id"]: r["gt_id"] for r in m}
    assert got == {0: 1, 1: 0}
    assert m[0]["error_norm"] == [0.01 / 0.1]

    # gt 1 invalid -> est 0 falls back to gt 0; est 1's remaining error 0.2
    # exceeds the threshold
    m2 = match_poses(errs, error_ths=[0.1], gt_valid_mask={0: True, 1: False})
    assert {r["est_id"]: r["gt_id"] for r in m2} == {0: 0}

    # two-element threshold ("5deg 5cm"): both must pass
    errs2 = [{"est_id": 0, "score": 1.0, "errors": {0: [4.0, 0.06]}}]
    assert match_poses(errs2, error_ths=[5.0, 0.05]) == []
    assert len(match_poses(errs2, error_ths=[5.0, 0.07])) == 1


def test_localization_scores():
    from gdrnet_tpu.eval.pose_matching import calc_localization_scores

    matches = [
        {"scene_id": 1, "im_id": 0, "obj_id": 5, "valid": True, "est_id": 0},
        {"scene_id": 1, "im_id": 1, "obj_id": 5, "valid": True, "est_id": -1},
        {"scene_id": 2, "im_id": 0, "obj_id": 7, "valid": True, "est_id": 3},
        {"scene_id": 2, "im_id": 0, "obj_id": 7, "valid": False, "est_id": -1},
    ]
    s = calc_localization_scores([1, 2], [5, 7], matches, n_top=1)
    assert s["recall"] == pytest.approx(2 / 3)
    assert s["obj_recalls"][5] == pytest.approx(0.5)
    assert s["obj_recalls"][7] == pytest.approx(1.0)
    assert s["scene_recalls"][1] == pytest.approx(0.5)


def test_auc_and_abs_threshold_semantics(scored_setup):
    """AUCxx = mean recall over the 10 thresholds 1..10 cm; ABSxx = recall at
    the single absolute 2 cm threshold (eval_pose_results_more.py:73-83)."""
    meta, records, models = scored_setup
    # pure-translation offset of exactly 3.5 cm -> add error == 3.5 cm:
    # passes thresholds 4..10 cm (7 of 10) -> AUCadd = 0.7; fails ABS (2 cm)
    results = []
    for g in records:
        results.append({"scene_id": g["scene_id"], "im_id": g["im_id"],
                        "obj_id": g["obj_id"], "score": 1.0, "R": g["R"].copy(),
                        "t": (g["t"] + np.array([0.035, 0, 0])) * 1000.0})
    scores = score_results(results, records, models, "AUCadd,ABSadd")
    assert scores["AUCadd"]["avg"] == pytest.approx(0.7)
    assert scores["ABSadd"]["avg"] == pytest.approx(0.0)
    # 1 cm offset: AUC passes 9/10, ABS passes
    results2 = []
    for g in records:
        results2.append({"scene_id": g["scene_id"], "im_id": g["im_id"],
                         "obj_id": g["obj_id"], "score": 1.0, "R": g["R"].copy(),
                         "t": (g["t"] + np.array([0.012, 0, 0])) * 1000.0})
    scores2 = score_results(results2, records, models, "AUCadd,ABSadd")
    assert scores2["AUCadd"]["avg"] == pytest.approx(0.9)
    assert scores2["ABSadd"]["avg"] == pytest.approx(1.0)


def test_sym_aware_error_variants(scored_setup):
    """Plain re/proj are not sym-aware; reS/projS take the min over the
    symmetry set (pose_error.re_sym/arp_2d_sym: min over syms). The fixture
    brick has a z-180 discrete symmetry: predicting the sym-equivalent
    rotation scores ~180 deg on re but ~0 on reS."""
    meta, records, models = scored_setup
    Rz = np.diag([-1.0, -1.0, 1.0]).astype(np.float32)
    results = []
    for g in records:
        R = g["R"] @ Rz if g["obj_id"] == 2 else g["R"]
        results.append({"scene_id": g["scene_id"], "im_id": g["im_id"],
                        "obj_id": g["obj_id"], "score": 1.0, "R": R,
                        "t": g["t"] * 1000.0})
    scores = score_results(results, records, models, "re,reS,proj,projS,te,teS",
                           sym_objs=["brick"])
    assert np.mean(scores["re"]["brick"]) == 0.0       # ~180 deg off
    assert np.mean(scores["reS"]["brick"]) == 1.0      # sym-equivalent
    assert np.mean(scores["proj"]["brick"]) < 0.5
    assert np.mean(scores["projS"]["brick"]) == 1.0
    assert np.mean(scores["re"]["cube"]) == 1.0        # non-sym unaffected
    assert np.mean(scores["te"]["brick"]) == 1.0
    assert np.mean(scores["teS"]["brick"]) == 1.0


def test_multi_instance_greedy_matching():
    """Two instances of one object in an image: estimates must claim the GT
    they are nearest to (greedy by translation error in score order, the BOP
    pose_matching.py protocol), not pair in arbitrary list order."""
    K = np.eye(3, dtype=np.float32)
    gts = [
        {"scene_id": 0, "im_id": 0, "obj_id": 1,
         "R": np.eye(3, dtype=np.float32), "t": np.array([0.0, 0.0, 0.5],
                                                         np.float32), "K": K},
        {"scene_id": 0, "im_id": 0, "obj_id": 1,
         "R": np.eye(3, dtype=np.float32), "t": np.array([0.2, 0.0, 0.9],
                                                         np.float32), "K": K},
    ]
    # estimates listed in the order that WOULD mispair under zip: the
    # higher-score estimate sits at the SECOND GT
    ests = [
        {"scene_id": 0, "im_id": 0, "obj_id": 1, "score": 0.9,
         "R": np.eye(3, dtype=np.float32), "t": np.array([200.0, 0.0, 900.0])},
        {"scene_id": 0, "im_id": 0, "obj_id": 1, "score": 0.8,
         "R": np.eye(3, dtype=np.float32), "t": np.array([0.0, 0.0, 500.0])},
    ]
    pairs = match_estimates_to_gt(ests, gts, n_top=-1)
    assert len(pairs) == 2
    for est, gt in pairs:
        assert est is not None
        np.testing.assert_allclose(np.asarray(est["t"]) / 1000.0, gt["t"],
                                   atol=1e-6)

    # 3 GTs, 2 estimates: the unclaimed GT comes back as a miss
    gts3 = gts + [{"scene_id": 0, "im_id": 0, "obj_id": 1,
                   "R": np.eye(3, dtype=np.float32),
                   "t": np.array([-0.3, 0.1, 0.7], np.float32), "K": K}]
    pairs = match_estimates_to_gt(ests, gts3, n_top=-1)
    assert sum(1 for e, _ in pairs if e is None) == 1
    miss_gt = next(g for e, g in pairs if e is None)
    np.testing.assert_allclose(miss_gt["t"], [-0.3, 0.1, 0.7], atol=1e-6)

    # n_top=1 still takes exactly one target for the key
    pairs = match_estimates_to_gt(ests, gts, n_top=1)
    assert len(pairs) == 1
