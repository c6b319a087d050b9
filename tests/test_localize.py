"""Multi-reference absolute-pose localization (far_tpu/eval/localize.py)
against synthetic scenes and, where available, the actual reference
implementation (mapfree_6dreg/lib/utils/localize.py) imported through
the transforms3d shim."""

import importlib.util
import os
import sys

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from far_tpu.eval import localize as fl

REF_LOCALIZE = "/root/reference/mapfree_6dreg/lib/utils/localize.py"
SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refshims")


@pytest.fixture(scope="module")
def ref():
    if not os.path.exists(REF_LOCALIZE):
        pytest.skip("reference localize.py not available")
    import matplotlib

    matplotlib.use("Agg")
    sys.path.insert(0, SHIMS)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_localize", REF_LOCALIZE)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(SHIMS)
    return mod


def _rot(seed):
    return Rotation.random(random_state=seed).as_matrix()


def _perturb(R, t, rng, rot_deg, t_frac):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    dR = Rotation.from_rotvec(np.radians(rot_deg) * axis).as_matrix()
    return dR @ R, t + rng.normal(size=3) * t_frac * np.linalg.norm(t)


def make_scene(seed=0, k=6, rot_noise_deg=0.0, t_noise_frac=0.0,
               n_outliers=0, pair_type="relapose"):
    """One query with k reference images; returns the raw arrays needed
    to build identical pair data in either implementation."""
    rng = np.random.default_rng(seed)
    r_q = _rot(seed + 1)
    c_q = rng.normal(size=3)
    refs = []
    for i in range(k):
        r_tr = _rot(seed + 10 + i)
        c_tr = c_q + rng.normal(size=3) * 2.0
        R_gt = r_q @ r_tr.T
        t_gt = -r_q @ (c_q - c_tr)
        if i < n_outliers:
            R_pred, t_pred = _rot(seed + 99 + i), rng.normal(size=3) * 3.0
        elif rot_noise_deg or t_noise_frac:
            R_pred, t_pred = _perturb(R_gt, t_gt, rng, rot_noise_deg,
                                      t_noise_frac)
        else:
            R_pred, t_pred = R_gt, t_gt
        entry = {"r_tr": r_tr, "c_tr": c_tr, "R_gt": R_gt, "t_gt": t_gt,
                 "R_pred": R_pred, "t_pred": t_pred,
                 "inliers": float(100 + i)}
        if pair_type == "ess":
            E = fl.essential_matrix_from_pose(R_pred, t_pred)
            entry["tc"], entry["R1"], entry["R2"] = \
                fl.decompose_essential_matrix(E)
        refs.append(entry)
    return {"r_q": r_q, "c_q": c_q, "refs": refs}


def build_pairs(scene, pair_type, module):
    """Instantiate pair data with either implementation's classes (the
    far_tpu module or the imported reference)."""
    m2q = fl.matrices_to_quats
    test_abs = module.AbsPose(m2q(scene["r_q"]), scene["c_q"])
    pairs = []
    for i, e in enumerate(scene["refs"]):
        train = module.AbsPose(m2q(e["r_tr"]), e["c_tr"])
        lbl = module.RelaPose(m2q(e["R_gt"]), e["t_gt"])
        if pair_type == "ess":
            p = module.EssPair("q0", f"tr{i}", train, lbl,
                               e["tc"], e["R1"], e["R2"])
            p.inliers = e["inliers"]
        else:
            pred = module.RelaPose(m2q(e["R_pred"]), e["t_pred"])
            try:
                p = module.RelaPosePair("q0", train, lbl, pred, 0.5,
                                        inliers=e["inliers"])
            except TypeError:  # reference ctor has no inliers kwarg
                p = module.RelaPosePair("q0", train, lbl, pred, 0.5)
                p.inliers = e["inliers"]
        pairs.append(p)
    return {"q0": {"test_abs_pose": test_abs, "test_pairs": pairs}}


# ------------------------------------------------------------------ #
# primitive parity vs the reference implementation
# ------------------------------------------------------------------ #

def test_angle_errors_match_reference(ref, rng):
    a = rng.normal(size=(32, 3))
    b = rng.normal(size=(32, 3))
    np.testing.assert_allclose(fl.vec_angle_error(a, b),
                               ref.cal_vec_angle_error(a, b), atol=1e-12)
    q1 = rng.normal(size=4)
    q2 = rng.normal(size=4)
    np.testing.assert_allclose(fl.quat_angle_error(q1, q2),
                               ref.cal_quat_angle_error(q1, q2), atol=1e-12)


def test_triangulate_matches_reference(ref, rng):
    x = rng.normal(size=(4, 2))
    P = rng.normal(size=(4, 3, 4))
    ours_multi = fl.triangulate_views(x, P)
    ref_multi = ref.triangulate_multi_views(list(zip(x, P)))
    np.testing.assert_allclose(np.abs(ours_multi), np.abs(ref_multi),
                               atol=1e-8)
    ours_two = fl.triangulate_views(x[:2], P[:2])
    ref_two = ref.triangulate_two_views(x[0], P[0], x[1], P[1])
    np.testing.assert_allclose(np.abs(ours_two), np.abs(ref_two), atol=1e-8)


def test_geometric_median_matches_reference(ref, rng):
    X = rng.normal(size=(25, 3))
    np.testing.assert_allclose(fl.geometric_median(X),
                               ref.geometric_median(X), atol=1e-4)


def test_precision_recall_matches_reference(ref, rng):
    inliers = rng.integers(0, 50, size=40).astype(float)
    tp = rng.random(40) > 0.4
    p0, r0, a0 = fl.precision_recall(inliers, tp, failures=3)
    p1, r1, a1 = ref.precision_recall(inliers, tp, failures=3)
    np.testing.assert_allclose(p0, p1)
    np.testing.assert_allclose(r0, r1)
    assert abs(a0 - a1) < 1e-12


def test_essential_helpers_match_reference(ref, rng):
    R = _rot(7)
    t = rng.normal(size=3)
    np.testing.assert_allclose(fl.hat(t), ref.hat(t))
    np.testing.assert_allclose(fl.essential_matrix_from_pose(R, t),
                               ref.essential_matrix_from_pose(R, t),
                               atol=1e-6)
    F = rng.normal(size=(3, 3))
    np.testing.assert_allclose(fl.project_onto_essential_space(F),
                               ref.project_onto_essential_space(F),
                               atol=1e-10)
    t0, R1, R2 = fl.decompose_essential_matrix(F)
    t1, R1r, R2r = ref.decompose_essential_matrix(F)
    np.testing.assert_allclose(t0, t1, atol=1e-10)
    np.testing.assert_allclose(R1, R1r, atol=1e-10)
    np.testing.assert_allclose(R2, R2r, atol=1e-10)


def test_quat_matrix_roundtrip(rng):
    R = Rotation.random(16, random_state=3).as_matrix()
    q = fl.matrices_to_quats(R)
    assert (q[:, 0] >= 0).all()
    np.testing.assert_allclose(fl.quats_to_matrices(q), R, atol=1e-10)


def test_average_quaternions_matches_scipy(rng):
    R = Rotation.random(10, random_state=4)
    q_ours = fl.average_quaternions(fl.matrices_to_quats(R.as_matrix()))
    q_scipy = fl.matrices_to_quats(R.mean().as_matrix())
    np.testing.assert_allclose(q_ours, q_scipy, atol=1e-8)


@pytest.mark.parametrize("pair_type", ["relapose", "ess"])
def test_find_inliers_and_model_match_reference(ref, pair_type):
    scene = make_scene(seed=11, k=7, rot_noise_deg=3.0, t_noise_frac=0.05,
                       n_outliers=2, pair_type=pair_type)
    ours = build_pairs(scene, pair_type, fl)["q0"]["test_pairs"]
    theirs = build_pairs(scene, pair_type, ref)["q0"]["test_pairs"]
    hypo_ours = fl.AbsPose(fl.matrices_to_quats(scene["r_q"]),
                           scene["c_q"] + 0.05)
    hypo_ref = ref.AbsPose(fl.matrices_to_quats(scene["r_q"]),
                           scene["c_q"] + 0.05)
    for thres in (2.0, 10.0, 45.0):
        inl_ours = fl.find_inliers(hypo_ours, ours, thres,
                                   pair_type=pair_type)
        inl_ref = ref.find_inliers(hypo_ref, theirs, thres,
                                   pair_type=pair_type)
        assert list(inl_ours) == list(inl_ref), thres
        if len(inl_ours) >= 2:
            m_ours = fl.estimate_model(ours, inl_ours, pair_type)
            m_ref = ref.estimate_model(theirs, inl_ref, pair_type)
            np.testing.assert_allclose(m_ours.c, m_ref.c, atol=1e-6)
            np.testing.assert_allclose(m_ours.q, m_ref.q, atol=1e-6)


@pytest.mark.parametrize("pair_type", ["relapose", "ess"])
def test_ransac_matches_reference(ref, pair_type):
    """Full per-query RANSAC on the same noisy scene: in_iter=0 removes
    the only stochastic step, so the recovered medians must agree."""
    pair_data_ours = {}
    pair_data_ref = {}
    for s in range(4):
        scene = make_scene(seed=40 + s, k=6, rot_noise_deg=2.0,
                           t_noise_frac=0.03, n_outliers=1,
                           pair_type=pair_type)
        pair_data_ours[f"q{s}"] = build_pairs(
            scene, pair_type, fl)["q0"] | {}
        pair_data_ref[f"q{s}"] = build_pairs(scene, pair_type, ref)["q0"]
    loc_ours, loc_ref = {}, {}
    n0, a0, rates0, med0 = fl.ransac(
        pair_data_ours, 10.0, in_iter=0, pair_type=pair_type,
        loc_results=loc_ours)
    n1, a1, rates1, med1 = ref.ransac(
        pair_data_ref, 10.0, in_iter=0, pair_type=pair_type,
        loc_results=loc_ref)
    assert n0 == n1
    assert list(a0) == list(a1)
    np.testing.assert_allclose(rates0, rates1)
    np.testing.assert_allclose(med0, med1, atol=5e-3)


@pytest.mark.slow
@pytest.mark.parametrize("pair_type", ["relapose", "ess"])
def test_ransac_matches_reference_randomized(ref, pair_type):
    """Wider randomized sweep: many seeds, small k, outlier-heavy and
    near-clean scenes, all compared query-by-query (in_iter=0 keeps both
    implementations deterministic)."""
    cases = [
        dict(k=2, rot_noise_deg=0.5, t_noise_frac=0.01, n_outliers=0),
        dict(k=3, rot_noise_deg=1.0, t_noise_frac=0.02, n_outliers=1),
        dict(k=5, rot_noise_deg=4.0, t_noise_frac=0.08, n_outliers=2),
        dict(k=8, rot_noise_deg=2.0, t_noise_frac=0.04, n_outliers=4),
        dict(k=10, rot_noise_deg=0.0, t_noise_frac=0.0, n_outliers=0),
    ]
    for case_i, case in enumerate(cases):
        for s in range(6):
            seed = 1000 + 100 * case_i + s
            scene = make_scene(seed=seed, pair_type=pair_type, **case)
            ours = build_pairs(scene, pair_type, fl)
            theirs = build_pairs(scene, pair_type, ref)
            loc_o, loc_r = {}, {}
            ro = fl.ransac({"q": ours["q0"]}, 10.0, in_iter=0,
                           pair_type=pair_type, loc_results=loc_o)
            rr = ref.ransac({"q": theirs["q0"]}, 10.0, in_iter=0,
                            pair_type=pair_type, loc_results=loc_r)
            ctx = f"{pair_type} case={case} seed={seed}"
            assert list(ro[1]) == list(rr[1]), ctx  # approximated queries
            np.testing.assert_allclose(ro[2], rr[2], err_msg=ctx)
            np.testing.assert_allclose(ro[3], rr[3], atol=1e-2,
                                       err_msg=ctx)
            if loc_o["q"] is not None:
                np.testing.assert_allclose(
                    loc_o["q"]["abs_pose_pred"].c,
                    loc_r["q"]["abs_pose_pred"].c, atol=1e-4, err_msg=ctx)


# ------------------------------------------------------------------ #
# behavior on synthetic scenes
# ------------------------------------------------------------------ #

@pytest.mark.parametrize("pair_type", ["relapose", "ess"])
def test_ransac_recovers_pose_with_outliers(pair_type):
    scene = make_scene(seed=5, k=8, rot_noise_deg=0.5, t_noise_frac=0.01,
                       n_outliers=2, pair_type=pair_type)
    pair_data = build_pairs(scene, pair_type, fl)
    loc = {}
    _n, approx, rates, med = fl.ransac(pair_data, 5.0,
                                       pair_type=pair_type,
                                       loc_results=loc)
    assert not approx
    assert med[2] < 0.3, med     # abs position error (m)
    assert med[4] < 5.0, med     # abs rotation error (deg)
    assert rates[2] == 100.0     # loosest (5m, 10deg) gate
    res = loc["q0"]
    assert not res["approximated"]
    assert res["inliers"] > 0


def test_ransac_failure_and_approximation_paths():
    scene = make_scene(seed=6, k=1)
    pair_data = build_pairs(scene, "relapose", fl)
    pair_data["empty"] = {
        "test_abs_pose": fl.AbsPose(np.array([1.0, 0, 0, 0]), np.zeros(3)),
        "test_pairs": []}
    loc = {}
    n, approx, _rates, med = fl.ransac(pair_data, 5.0,
                                       pair_type="relapose",
                                       loc_results=loc)
    assert n == 2
    assert approx == ["q0"]      # single pair -> approximated
    assert loc["empty"] is None  # no pairs -> failure sentinel
    assert med[2] >= 1.0         # dominated by the 1000 m sentinel


def test_degenerate_pair_scores_as_outlier():
    """A pair with a zero predicted translation (NaN angle) must be an
    outlier, matching the reference's warnings-as-errors behavior in
    find_inliers — not a perfect inlier."""
    scene = make_scene(seed=8, k=5)
    pairs = build_pairs(scene, "relapose", fl)["q0"]["test_pairs"]
    pairs[0].rela_pose_pred.t = np.zeros(3)
    hypo = fl.AbsPose(fl.matrices_to_quats(scene["r_q"]),
                      scene["c_q"] + 0.01)
    inl = fl.find_inliers(hypo, pairs, 10.0, pair_type="relapose")
    assert 0 not in inl
    assert set(inl) == {1, 2, 3, 4}


def test_ransac_sweep_returns_best_threshold():
    scene = make_scene(seed=9, k=6, rot_noise_deg=1.0, t_noise_frac=0.02)
    result_dict = {"s": {"pair_data": build_pairs(scene, "relapose", fl)}}
    # 0.05 deg starves the solver into the approximation fallback; the
    # tracker must return the good sweep point, not the last/worst one
    best, _ = fl.eval_pipeline_with_ransac(
        result_dict, ransac_thres=[10.0, 0.05], ransac_iter=0,
        ransac_miu=1.414, pair_type="relapose",
        err_thres=[(0.25, 2), (0.5, 5)])
    assert best[0] < 0.5


def test_direct_metric_pipeline(tmp_path):
    result_dict = {}
    for s in range(2):
        scene = make_scene(seed=20 + s, k=5, rot_noise_deg=1.0,
                           t_noise_frac=0.02)
        result_dict[f"scene{s}"] = {
            "pair_data": build_pairs(scene, "relapose", fl),
            "no_pt_pairs": []}
    save = str(tmp_path / "loc_res.npy")
    eval_val, passed = fl.eval_pipeline_without_ransac(
        result_dict, err_thres=((0.25, 2), (0.5, 5)), save_res_path=save)
    assert eval_val[2] < 0.5     # abs position error small
    assert passed.shape == (2,)
    fl.save_results_visualisation(save)
    assert (tmp_path / "pose_scene0.txt").exists()
    txt = (tmp_path / "pose_scene0.txt").read_text()
    assert txt.startswith("q0 ")
    fl.generate_precision_recall_plots(save, pose_threshold=(0.5, 5))
    assert (tmp_path / "pr_scene0.jpg").exists()
    assert (tmp_path / "pr_all.jpg").exists()


def test_ransac_pipeline_smoke(tmp_path):
    scene = make_scene(seed=30, k=5, rot_noise_deg=1.0, t_noise_frac=0.02)
    result_dict = {"s": {"pair_data": build_pairs(scene, "relapose", fl)}}
    best, _rates = fl.eval_pipeline_with_ransac(
        result_dict, ransac_thres=[10.0], ransac_iter=2, ransac_miu=1.414,
        pair_type="relapose", err_thres=[(0.25, 2), (0.5, 5)],
        save_res_path=str(tmp_path / "r.npy"))
    assert best[0] < 0.5
    assert (tmp_path / "r.npy").exists()


def test_save_video_smoke(tmp_path):
    pytest.importorskip("cv2")
    from far_tpu.eval.visualise import save_video

    scene = make_scene(seed=31, k=4)
    pair_data = build_pairs(scene, "relapose", fl)
    loc = {}
    fl.ransac(pair_data, 5.0, pair_type="relapose", loc_results=loc)
    res_path = str(tmp_path / "loc.npy")
    np.save(res_path, {"sceneA": loc})
    rng = np.random.default_rng(0)
    batches = [{
        "scene_id": "sceneA",
        "pair_names": ("ref.jpg", "q0"),
        "image0": rng.random((1, 64, 48, 3), np.float32),
        "image1": rng.random((1, 64, 48, 1), np.float32),
    }]
    arts = save_video(res_path, batches, str(tmp_path / "vids"))
    assert "sceneA" in arts
    assert os.path.exists(arts["sceneA"])
