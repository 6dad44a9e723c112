"""Eval-stack tests: batched jnp metrics vs direct numpy reimplementations of
the reference formulas (pose_error.py), BOP CSV round-trip, evaluator
aggregation with perfect/noisy poses."""

import os.path as osp

import numpy as np
import jax.numpy as jnp
import pytest

from gdrnet_tpu.eval import pose_errors as PE
from gdrnet_tpu.eval.bop_writer import save_bop_results, load_bop_results
from gdrnet_tpu.eval.custom_evaluator import CustomEvaluator


def _rand_rot(rng, n):
    A = rng.randn(n, 3, 3)
    Q, R = np.linalg.qr(A)
    d = np.sign(np.diagonal(R, axis1=-2, axis2=-1))
    Q = Q * d[:, None, :]
    Q[:, :, 0] *= np.linalg.det(Q)[:, None]
    return Q.astype(np.float32)


def _np_add(Re, te_, Rg, tg, pts):
    pe = pts @ Re.T + te_
    pg = pts @ Rg.T + tg
    return np.linalg.norm(pe - pg, axis=1).mean()


def _np_adi(Re, te_, Rg, tg, pts):
    from scipy import spatial
    pe = pts @ Re.T + te_
    pg = pts @ Rg.T + tg
    nn = spatial.cKDTree(pe)
    d, _ = nn.query(pg, k=1)
    return d.mean()


def _np_re(Re, Rg):
    cos = np.clip(0.5 * (np.trace(Re @ Rg.T) - 1), -1, 1)
    return np.degrees(np.arccos(cos))


def _np_proj(Re, te_, Rg, tg, K, pts):
    def p2(R, t):
        c = pts @ R.T + t
        uv = c @ K.T
        return uv[:, :2] / uv[:, 2:3]
    return np.linalg.norm(p2(Re, te_) - p2(Rg, tg), axis=1).mean()


@pytest.fixture
def poses(rng):
    B, N = 4, 300
    Re = _rand_rot(rng, B)
    Rg = _rand_rot(rng, B)
    te_ = rng.rand(B, 3).astype(np.float32) * 0.1 + np.array([0, 0, 0.6], np.float32)
    tg = te_ + rng.randn(B, 3).astype(np.float32) * 0.01
    pts = (rng.rand(N, 3).astype(np.float32) - 0.5) * 0.1
    K = np.tile(np.asarray([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]],
                           np.float32), (B, 1, 1))
    return Re, te_, Rg, tg, pts, K


def test_add_matches_numpy(poses):
    Re, te_, Rg, tg, pts, K = poses
    got = np.asarray(PE.add_batch(Re, te_, Rg, tg, pts))
    want = [_np_add(Re[i], te_[i], Rg[i], tg[i], pts) for i in range(len(Re))]
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_adi_matches_kdtree(poses):
    Re, te_, Rg, tg, pts, K = poses
    got = np.asarray(PE.adi_batch(Re, te_, Rg, tg, pts, chunk=128))
    want = [_np_adi(Re[i], te_[i], Rg[i], tg[i], pts) for i in range(len(Re))]
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_re_te_proj_match_numpy(poses):
    Re, te_, Rg, tg, pts, K = poses
    np.testing.assert_allclose(
        np.asarray(PE.re_batch(Re, Rg)),
        [_np_re(Re[i], Rg[i]) for i in range(len(Re))], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(PE.te_batch(te_, tg)),
        np.linalg.norm(te_ - tg, axis=1), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(PE.proj_batch(Re, te_, Rg, tg, K, pts)),
        [_np_proj(Re[i], te_[i], Rg[i], tg[i], K[i], pts) for i in range(len(Re))],
        rtol=1e-3)


def test_mssd_mspd_identity_sym(poses):
    """With identity-only sym set, mssd = max point distance."""
    Re, te_, Rg, tg, pts, K = poses
    B = len(Re)
    sym = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1, 1))
    mask = np.ones((B, 1), bool)
    got = np.asarray(PE.mssd_batch(Re, te_, Rg, tg, pts, sym, mask))
    pe = np.einsum("bij,nj->bni", Re, pts) + te_[:, None]
    pg = np.einsum("bij,nj->bni", Rg, pts) + tg[:, None]
    want = np.linalg.norm(pe - pg, axis=-1).max(axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4)
    got_p = np.asarray(PE.mspd_batch(Re, te_, Rg, tg, K, pts, sym, mask))
    assert np.all(got_p >= 0) and np.all(np.isfinite(got_p))


def test_vocap_auc_extremes():
    assert PE.vocap_auc(np.zeros(100) + 1e-9, 0.1) > 0.99
    assert PE.vocap_auc(np.full(100, 1.0), 0.1) == 0.0
    mid = PE.vocap_auc(np.full(100, 0.05), 0.1)
    assert 0.4 < mid < 0.6


def test_bop_csv_roundtrip(rng, tmp_path):
    results = [
        {"scene_id": 2, "im_id": 41, "obj_id": 1, "score": 0.9,
         "R": _rand_rot(rng, 1)[0], "t": rng.rand(3) * 1000, "time": 0.05}
        for _ in range(5)
    ]
    p = str(tmp_path / "res.csv")
    save_bop_results(p, results)
    loaded = load_bop_results(p)
    assert len(loaded) == 5
    np.testing.assert_allclose(loaded[0]["R"], results[0]["R"], atol=1e-6)
    np.testing.assert_allclose(loaded[0]["t"], results[0]["t"], atol=1e-5)


def test_custom_evaluator_perfect_and_noisy(rng):
    pts = (rng.rand(200, 3).astype(np.float32) - 0.5) * 0.1
    diameter = float(np.linalg.norm(pts.max(0) - pts.min(0)))
    ev = CustomEvaluator(["ape"], {"ape": pts}, {"ape": diameter})
    K = np.asarray([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float32)
    Rg = _rand_rot(rng, 8)
    tg = rng.rand(8, 3).astype(np.float32) * 0.1 + np.array([0, 0, 0.6], np.float32)
    # perfect predictions
    for i in range(8):
        ev.process("ape", Rg[i], tg[i], Rg[i], tg[i], K)
    res = ev.evaluate()
    assert res["ape"]["ad_10"] == 1.0
    assert res["ape"]["rete_2"] == 1.0
    assert res["Avg"]["ad_10"] == 1.0
    # garbage predictions -> ~0 recall
    ev.reset()
    Rbad = _rand_rot(rng, 8)
    for i in range(8):
        ev.process("ape", Rbad[i], tg[i] + 1.0, Rg[i], tg[i], K)
    res = ev.evaluate()
    assert res["ape"]["ad_10"] < 0.3
    assert isinstance(ev.summarize(res), str)


def test_custom_evaluator_symmetric(rng):
    """180-deg z-symmetric object: prediction rotated by the sym transform
    must still score ad_10 = 1 via ADI + closest-rot."""
    pts = (rng.rand(300, 3).astype(np.float32) - 0.5) * np.asarray([0.1, 0.1, 0.04], np.float32)
    diameter = float(np.linalg.norm(pts.max(0) - pts.min(0)))
    sym_z = np.asarray([[[-1, 0, 0], [0, -1, 0], [0, 0, 1]]], np.float32)
    ev = CustomEvaluator(["eggbox"], {"eggbox": pts}, {"eggbox": diameter},
                         sym_objs=["eggbox"], sym_rots={"eggbox": sym_z})
    K = np.asarray([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float32)
    Rg = _rand_rot(rng, 6)
    tg = rng.rand(6, 3).astype(np.float32) * 0.05 + np.array([0, 0, 0.6], np.float32)
    for i in range(6):
        ev.process("eggbox", Rg[i] @ sym_z[0], tg[i], Rg[i], tg[i], K)
    res = ev.evaluate()
    assert res["eggbox"]["re_2"] == 1.0  # closest-rot absorbs the symmetry


def test_latex_report_and_plots(tmp_path):
    """eval/report.py: compilable-shaped latex with per-object columns, and
    plot files written (latex_report.py / eval_plots.py parity)."""
    from gdrnet_tpu.eval.report import (
        scores_to_latex, write_latex_report, plot_t_err_recall, plot_err_hist)

    scores = {"ad_10": {"ape": 0.5, "can": 0.25, "avg": 0.375},
              "re_5": {"ape": 1.0, "avg": 1.0}}
    tex = scores_to_latex(scores, caption="fixture_scores")
    assert "50.00" in tex and "37.50" in tex and r"fixture\_scores" in tex
    assert tex.count("&") == 3 * 3  # header + 2 rows, 3 separators each

    path = str(tmp_path / "report.tex")
    full = write_latex_report(path, scores, title="unit_test")
    assert full.startswith("\\documentclass") and full.rstrip().endswith(
        "\\end{document}")
    assert osp.exists(path)

    rng = np.random.RandomState(0)
    p1 = str(tmp_path / "t_recall.png")
    p2 = str(tmp_path / "re_hist.png")
    plot_t_err_recall(rng.rand(32, 3) * 0.05, p1)
    plot_err_hist(rng.rand(32) * 10, p2, xlabel="rotation err [deg]")
    assert osp.getsize(p1) > 1000 and osp.getsize(p2) > 1000


def test_custom_evaluator_missing_recall_vs_precision(rng):
    """Undetected GTs count as recall failures (reference
    gdrn_custom_evaluator.py:552-556) but are ignored in precision mode
    (:728-734); fully-undetected objects get all-zero recall rows."""
    pts = (rng.rand(100, 3).astype(np.float32) - 0.5) * 0.1
    d = float(np.linalg.norm(pts.max(0) - pts.min(0)))
    K = np.asarray([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float32)
    Rg = _rand_rot(rng, 4)
    tg = rng.rand(4, 3).astype(np.float32) * 0.1 + np.array([0, 0, 0.6], np.float32)

    ev = CustomEvaluator(["ape", "duck"], {"ape": pts, "duck": pts},
                         {"ape": d, "duck": d})
    for i in range(4):  # 4 perfect matches + 4 undetected ape GTs
        ev.process("ape", Rg[i], tg[i], Rg[i], tg[i], K)
    ev.record_missing("ape", 4)
    ev.record_missing("duck", 2)  # duck never detected at all
    res = ev.evaluate()
    assert res["ape"]["ad_10"] == 0.5 and res["ape"]["count"] == 8
    assert res["ape"]["n_missing"] == 4
    assert res["ape"]["mean_re"] < 1e-3  # means stay over matched pairs
    assert res["duck"]["ad_10"] == 0.0 and res["duck"]["count"] == 2
    assert res["Avg"]["ad_10"] == 0.25
    assert np.isfinite(res["Avg"]["mean_re"])  # nanmean skips duck's nan

    # precision mode: undetected GTs ignored entirely
    evp = CustomEvaluator(["ape", "duck"], {"ape": pts, "duck": pts},
                          {"ape": d, "duck": d}, eval_precision=True)
    for i in range(4):
        evp.process("ape", Rg[i], tg[i], Rg[i], tg[i], K)
    evp.record_missing("ape", 4)
    evp.record_missing("duck", 2)
    resp = evp.evaluate()
    assert resp["ape"]["ad_10"] == 1.0 and resp["ape"]["count"] == 4
    assert "duck" not in resp
