"""Test-time orchestration: inference over padded ROI buckets + evaluation.

The reference's do_test / gdrn_inference_on_dataset
(core/gdrn_modeling/engine.py:121-142, gdrn_evaluator.py:516-631): per test
image, all detections form one ROI batch (here padded to a static bucket so
one compiled program serves every image), the net pose is decoded on device,
and predictions flow into the in-process CustomEvaluator and/or a BOP19 CSV.
Timing is split compute vs process with warmup excluded (:545-624).
"""

from __future__ import annotations

import os.path as osp
import time
from collections import defaultdict

import numpy as np

from gdrnet_tpu.data import GDRNTestMapper, load_detections
from gdrnet_tpu.engine.pnp_refine import refine_bucket_poses
from gdrnet_tpu.engine.steps import make_predict_step
from gdrnet_tpu.eval import CustomEvaluator, save_bop_results


def build_test_items(records: list[dict], detections: dict | None = None,
                     bbox_type: str = "gt") -> list:
    """Group per-instance records into per-image (rgb_path, K, rois, gts).

    bbox_type "gt": ROI boxes from GT annotations (TEST.TEST_BBOX_TYPE=gt);
    "est": boxes from a detections dict (load_detections output)."""
    by_img: dict = defaultdict(list)
    for r in records:
        by_img[(r["scene_id"], r["im_id"])].append(r)
    items = []
    for key, recs in sorted(by_img.items()):
        r0 = recs[0]
        if bbox_type == "gt" or detections is None:
            rois = []
            for r in recs:
                x, y, w, h = r["bbox_visib"]
                rois.append({"obj_id": r["obj_id"],
                             "bbox": [x, y, x + w, y + h], "score": 1.0})
        else:
            rois = [dict(d, bbox=d.get("bbox_est", d.get("bbox")), bbox_mode="xywh")
                    for d in detections.get(key, [])]
        if rois:
            items.append((r0["rgb_path"], r0["K"], rois,
                          {"scene_id": key[0], "im_id": key[1], "gts": recs}))
    return items


def do_test(cfg, model, variables, models, records: list[dict],
            output_dir: str | None = None, data_root: str = "datasets/BOP_DATASETS",
            save_csv: bool = True, shard: int | None = None,
            num_shards: int | None = None) -> dict:
    """Run inference + in-process eval. Returns the evaluator results dict.

    Multi-host: each process evaluates its contiguous shard of the flat ROI
    stream and predictions are gathered to every process before scoring
    (reference all_gather of evaluator predictions, gdrn_evaluator.py:439-444
    over NCCL -> here parallel.multihost.all_gather_objects)."""
    from gdrnet_tpu.parallel import multihost as mh

    shard = mh.get_rank() if shard is None else shard
    num_shards = mh.get_world_size() if num_shards is None else num_shards
    detections = None
    # reference gating: detections load iff MODEL.LOAD_DETS_TEST (engine.py
    # evaluator setup + dataset_utils.load_detections_into_dataset); the
    # boxes are then used when TEST.TEST_BBOX_TYPE == "est"
    if (cfg.DATASETS.DET_FILES_TEST and cfg.TEST.TEST_BBOX_TYPE == "est"
            and cfg.MODEL.get("LOAD_DETS_TEST", False)):
        detections = load_detections(
            cfg.DATASETS.DET_FILES_TEST[0], score_thr=cfg.DATASETS.DET_THR,
            topk_per_obj=cfg.DATASETS.DET_TOPK_PER_OBJ)
    items = build_test_items(records, detections, cfg.TEST.TEST_BBOX_TYPE)

    if cfg.VAL.get("USE_BOP"):
        # fail fast on a bad VAL.ERROR_TYPES, not after full inference
        from gdrnet_tpu.eval.bop_score import validate_error_types

        types = validate_error_types(cfg.VAL.ERROR_TYPES)
        if "vsd" in types and not any("depth_path" in r for r in records):
            raise ValueError(
                "VAL.ERROR_TYPES includes vsd but no test record has a "
                "depth_path — the split has no depth/ images (vsd needs "
                "d_test); failing before inference")

    use_pnp = cfg.TEST.USE_PNP
    bucket = cfg.TEST.ROI_BATCH_SIZE
    if cfg.TEST.get("DEVICE_PREPROCESS"):
        from gdrnet_tpu.data.mapper import GDRNDeviceTestMapper

        mapper = GDRNDeviceTestMapper(cfg, models, roi_batch_size=bucket)
    else:
        mapper = GDRNTestMapper(cfg, models, roi_batch_size=bucket)
    if cfg.TEST.get("FOLD_BN"):
        # inference-only: BN running stats fold into conv kernels
        # (utils/fold_bn.py; composes with INT8 — folded kernels quantize)
        from gdrnet_tpu.utils.fold_bn import fold_variables

        extra = {k: v for k, v in variables.items()
                 if k not in ("params", "batch_stats")}
        variables = {**fold_variables(variables), **extra}
    # local data-parallel inference (TEST.LOCAL_DEVICES, default all): one
    # process drives every local chip by sharding the static bucket over a
    # 1-D mesh — params replicated, batch dim sharded (GSPMD). The reference
    # needs one DDP process per GPU for the same coverage (engine.py:121-142).
    from gdrnet_tpu.parallel import local_dp_setup, shard_batch

    mesh, variables = local_dp_setup(
        variables, bucket, cfg.TEST.get("LOCAL_DEVICES", -1))
    predict = make_predict_step(model, mesh=mesh, with_maps=use_pnp)
    int8 = bool(cfg.TEST.get("INT8"))

    evaluator = CustomEvaluator(
        models.objs, models.points, models.diameters,
        sym_objs=[o for o in cfg.DATASETS.SYM_OBJS if o in models.objs],
        sym_rots={k: v for k, v in models.sym_rots.items() if v is not None},
        eval_precision=cfg.VAL.get("EVAL_PRECISION", False))

    # GT instances with no detection are recall failures (reference
    # gdrn_custom_evaluator.py:552-556); count them once (shard 0) so the
    # multi-shard gather sums to the true total.
    if shard == 0 and detections is not None:
        from collections import Counter

        gt_cnt_by_img: dict = defaultdict(Counter)
        for r in records:
            gt_cnt_by_img[(r["scene_id"], r["im_id"])][int(r["obj_id"])] += 1
        for key, gt_cnt in gt_cnt_by_img.items():
            det_cnt = Counter(int(d["obj_id"]) for d in detections.get(key, []))
            for oid, n_gt in gt_cnt.items():
                n_miss = max(0, n_gt - det_cnt.get(oid, 0))
                name = models.meta.id2obj.get(oid)
                if n_miss and name is not None and name in models.points:
                    evaluator.record_missing(name, n_miss)

    # TPU-first packing: flatten every (image, detection) into one stream and
    # fill each static bucket COMPLETELY (the reference batches per image,
    # data_loader.py:389 — that leaves most of a fixed bucket empty).
    # Estimates are matched to GT per (image, object) AFTER inference so
    # images with several instances of the same object score every instance
    # (the reference custom evaluator collapses them to one file_name-keyed
    # entry, gdrn_custom_evaluator.py:481-491 — a known blind spot for
    # YCB-V-style duplicate-object scenes; the BOP path matches per
    # instance, and so does this).
    groups: list[dict] = []
    flat: list[tuple] = []
    for rgb_path, K, rois, info in items:
        gts_by_obj: dict = defaultdict(list)
        for g in info["gts"]:
            gts_by_obj[int(g["obj_id"])].append(g)
        dets_by_obj: dict = defaultdict(list)
        for det in rois:
            dets_by_obj[int(det["obj_id"])].append(det)
        for oid, dets in dets_by_obj.items():
            grp = {"scene_id": info["scene_id"], "im_id": info["im_id"],
                   "obj_id": oid, "gts": gts_by_obj.get(oid, []), "ests": []}
            groups.append(grp)
            for det in dets:
                flat.append((rgb_path, K, det, grp))

    if num_shards > 1:
        # contiguous shard of GROUPS (not raw dets) so every group's
        # estimates land on one shard and est<->gt matching stays local
        per = -(-len(groups) // num_shards)
        groups = groups[shard * per:(shard + 1) * per]
        shard_groups = set(id(g) for g in groups)
        flat = [f for f in flat if id(f[3]) in shard_groups]

    bop_results = []
    total_compute, total_process, n_buckets = 0.0, 0.0, 0

    # pipeline host mapping with device compute: one producer thread maps
    # bucket i+1 (cv2 decode/warp — the host bottleneck) while the device
    # runs bucket i (the reference's per-image loop serializes the two,
    # gdrn_evaluator.py:545-560)
    import queue as _queue
    import threading as _threading

    buckets_q: _queue.Queue = _queue.Queue(maxsize=2)
    cancel = _threading.Event()

    def _put(item) -> bool:
        while not cancel.is_set():
            try:
                buckets_q.put(item, timeout=0.5)
                return True
            except _queue.Full:
                continue
        return False

    def _producer():
        try:
            for start_ in range(0, len(flat), bucket):
                if cancel.is_set():
                    return
                chunk_ = flat[start_:start_ + bucket]
                batch_ = mapper.map_flat([(p, K, d) for p, K, d, _ in chunk_])
                if not _put((start_, chunk_, batch_)):
                    return
            _put(None)
        except BaseException as e:  # surface mapper errors in the main loop
            _put(e)

    producer = _threading.Thread(target=_producer, daemon=True)
    producer.start()
    try:
        while True:
            item = buckets_q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            start, chunk, batch = item
            t0 = time.perf_counter()
            dev_batch = {k: v for k, v in batch.items()
                         if k not in ("valid", "scores", "obj_ids", "im_hws")}
            if int8:  # calibrate activation scales on the first bucket
                from gdrnet_tpu.models.quantize import calibrate_act_scales

                scales = calibrate_act_scales(model, variables, [dev_batch])
                predict = make_predict_step(
                    model, mesh=mesh, with_maps=use_pnp, int8_scales=scales)
                int8 = False
            if mesh is not None:
                dev_batch = shard_batch(dev_batch, mesh)
            out = predict(variables, dev_batch)
            if use_pnp:
                # TEST.DEVICE_PNP solves the whole bucket's RANSAC-EPnP/LM
                # as one XLA program; otherwise the reference's per-ROI cv2
                # loop runs on host (gdrn_evaluator.py:187-435). Either way
                # refinement is pose computation, so it lands in the compute
                # window.
                rot, trans = refine_bucket_poses(
                    cfg, models, batch, dev_batch, out, seed=start)
            else:
                rot = np.array(out["rot"])
                trans = np.array(out["trans"])
            if start > 0:  # warmup-excluded timing (gdrn_evaluator.py:545)
                total_compute += time.perf_counter() - t0
                n_buckets += 1

            t1 = time.perf_counter()
            for j, (_, _, _, meta_j) in enumerate(chunk):
                obj_id = int(batch["obj_ids"][j])
                bop_results.append({
                    "scene_id": meta_j["scene_id"], "im_id": meta_j["im_id"],
                    "obj_id": obj_id, "score": float(batch["scores"][j]),
                    "R": rot[j], "t": trans[j] * 1000.0,
                    "time": (time.perf_counter() - t0)})
                meta_j["ests"].append(
                    {"R": rot[j].copy(), "t": trans[j].copy(),
                     "score": float(batch["scores"][j])})
            if start > 0:
                total_process += time.perf_counter() - t1
    finally:
        # unblock + stop the producer if we exit via an exception mid-eval,
        # so repeated do_test calls in one process don't accumulate wedged
        # threads pinning mapped buckets
        cancel.set()
        producer.join(timeout=10)

    # est<->gt matching per (image, object) group: best-score estimate first,
    # each takes the remaining GT instance nearest in translation (greedy,
    # BOP-protocol style — pose_matching.py semantics with te as the
    # matching cost). One scored pair per GT instance; with EVAL_PRECISION
    # every surplus estimate is also judged against its nearest GT
    # (reference _eval_predictions_precision judges per estimate).
    for grp in groups:
        gts = grp["gts"]
        if not gts:
            continue
        name = models.meta.id2obj[grp["obj_id"]]
        ests = sorted(grp["ests"], key=lambda e: -e["score"])
        remaining = list(range(len(gts)))
        matched: list[tuple] = []
        for est in ests:
            if remaining:
                k = min(remaining, key=lambda i: float(
                    np.linalg.norm(est["t"] - gts[i]["t"])))
                remaining.remove(k)
                matched.append((est, gts[k]))
            elif cfg.VAL.get("EVAL_PRECISION", False):
                k = min(range(len(gts)), key=lambda i: float(
                    np.linalg.norm(est["t"] - gts[i]["t"])))
                matched.append((est, gts[k]))
        for est, gt in matched:
            evaluator.process(name, est["R"], est["t"], gt["R"], gt["t"], gt["K"])

    if num_shards > 1:
        # gather every shard's raw (pose, gt) pairs, then score globally
        gathered = mh.all_gather_objects(
            {"bop": bop_results, "preds": dict(evaluator._preds),
             "missing": dict(evaluator._missing)})
        bop_results = [r for g in gathered for r in g["bop"]]
        evaluator.reset()
        for g in gathered:
            for name, items_ in g["preds"].items():
                evaluator._preds[name].extend(items_)
            for name, n in g.get("missing", {}).items():
                evaluator._missing[name] += n

    # BOP CSV requires one time value per image (the official toolkit
    # rejects rows of the same image with differing times); report the max
    # over the image's estimates
    t_by_img: dict = {}
    for r_ in bop_results:
        key = (r_["scene_id"], r_["im_id"])
        t_by_img[key] = max(t_by_img.get(key, 0.0), r_["time"])
    for r_ in bop_results:
        r_["time"] = t_by_img[(r_["scene_id"], r_["im_id"])]

    results = evaluator.evaluate()
    if output_dir and save_csv and mh.is_main_process():
        csv_path = osp.join(
            output_dir, f"{models.meta.name}-test_gdrnet-tpu.csv")
        save_bop_results(csv_path, bop_results)
        results["_csv_path"] = csv_path
    if cfg.VAL.get("USE_BOP") and mh.is_main_process():
        # in-process BOP-toolkit-style scoring over VAL.ERROR_TYPES
        # (reference spawns eval_pose_results_more.py subprocesses,
        # test_utils.py:33-75; here eval/bop_score.py scores directly)
        from gdrnet_tpu.eval.bop_score import score_results, bop19_average_recall

        results["_bop"] = score_results(
            bop_results, records, models,
            error_types=cfg.VAL.ERROR_TYPES, n_top=cfg.VAL.N_TOP,
            sym_objs=[o for o in cfg.DATASETS.SYM_OBJS if o in models.objs],
            image_width=models.meta.width,
            precision=cfg.VAL.get("EVAL_PRECISION", False))
        results["_bop_average_recall"] = bop19_average_recall(results["_bop"])
    if n_buckets:
        results["_time"] = {"compute_s_per_bucket": total_compute / n_buckets,
                            "process_s_per_bucket": total_process / n_buckets,
                            "rois_per_bucket": bucket}
    results["_summary"] = evaluator.summarize(
        {k: v for k, v in results.items() if not k.startswith("_")})
    return results
