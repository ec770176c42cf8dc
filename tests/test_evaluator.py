"""Analytic unit tests for the LINEMOD pose-evaluation protocols
(eval/evaluator.py), pinning the metric math to the reference semantics
(lib/dataset/LM6D_REFINE.py:278-669): geodesic rot / trans errors, the
5cm5deg grid, eggbox 180-deg-z symmetry retry, ADD vs ADI (symmetric
classes), Simpson AUC normalization, and reprojection-2D pixel errors."""
import numpy as np
from scipy.spatial.transform import Rotation as R

from deepim_tpu.eval.evaluator import (
    PoseEvaluator,
    _add_errors,
    _adi_errors,
    _apply_eggbox_symmetry,
    _arp2d_errors,
    _rot_trans_errors,
)

K = np.array([[100.0, 0.0, 64.0], [0.0, 100.0, 48.0], [0.0, 0.0, 1.0]])


def pose(rot=None, t=(0.0, 0.0, 1.0)):
    p = np.zeros((3, 4))
    p[:, :3] = np.eye(3) if rot is None else rot
    p[:, 3] = t
    return p


def rot_z(deg):
    return R.from_euler("z", deg, degrees=True).as_matrix()


def make_evaluator(classes=("ape",), pts=None, diameter=0.1, num_iters=1):
    if pts is None:
        rng = np.random.RandomState(0)
        pts = rng.uniform(-0.03, 0.03, (50, 3))
    points = {c: pts for c in classes}
    diameters = {c: diameter for c in classes}
    return PoseEvaluator(classes, points, diameters, K, num_iters)


def test_rot_trans_errors_analytic():
    gt = np.stack([pose(), pose()])
    est = np.stack([pose(rot_z(7.0)), pose(t=(0.03, 0.04, 1.0))])
    r_err, t_err = _rot_trans_errors(est, gt)
    np.testing.assert_allclose(r_err, [7.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(t_err, [0.0, 0.05], atol=1e-9)  # 3-4-5


def test_evaluate_pose_5cm5deg_grid():
    # one pose inside (3 deg, 3 cm), one outside (7 deg, 7 cm) -> 50%.
    gt = [pose(), pose()]
    est = [pose(rot_z(3.0), t=(0.03, 0.0, 1.0)), pose(rot_z(7.0), t=(0.07, 0.0, 1.0))]
    ev = make_evaluator()
    res = ev.evaluate_pose([[est]], [[gt]])
    assert res["ape"][0]["acc_5cm_5deg"] == 50.0
    # the 3-deg pose is < 4deg too (grid index 3) but the 7-deg one is not < 10cm... it is;
    # rot grid: accuracy at 10 deg threshold includes both.
    assert res["ape"][0]["rot_acc"][-1] == 1.0
    assert res["ape"][0]["rot_acc"][0] == 0.0  # nothing < 1 deg


def test_eggbox_symmetry_retry():
    gt = [pose()]
    est_flipped = [pose(rot_z(180.0))]
    # eggbox: the 180-deg-z flip is retried away -> perfect.
    ev = make_evaluator(classes=("eggbox",))
    res = ev.evaluate_pose([[est_flipped]], [[gt]])
    assert res["eggbox"][0]["acc_5cm_5deg"] == 100.0
    # non-symmetric class: same pose counts as a 180-deg error.
    ev2 = make_evaluator(classes=("ape",))
    res2 = ev2.evaluate_pose([[est_flipped]], [[gt]])
    assert res2["ape"][0]["acc_5cm_5deg"] == 0.0


def test_apply_eggbox_symmetry_keeps_small_errors():
    gt = np.stack([pose(rot_z(10.0))])
    est = np.stack([pose(rot_z(12.0))])
    out = _apply_eggbox_symmetry(est, gt)
    np.testing.assert_allclose(out, est)  # 2 deg < 90: untouched


def test_add_translation_error_is_offset_norm():
    rng = np.random.RandomState(1)
    pts = rng.uniform(-0.05, 0.05, (100, 3))
    gt = np.stack([pose()])
    est = np.stack([pose(t=(0.003, 0.004, 1.0))])
    err = _add_errors(est, gt, pts)
    np.testing.assert_allclose(err, [0.005], atol=1e-9)


def test_adi_vs_add_on_rotationally_symmetric_points():
    # points on a circle about z: a z-rotation moves every point (ADD > 0)
    # onto another model point (ADI ~ 0).
    ang = np.linspace(0, 2 * np.pi, 360, endpoint=False)
    pts = np.stack([0.05 * np.cos(ang), 0.05 * np.sin(ang), np.zeros_like(ang)], axis=1)
    gt = np.stack([pose()])
    est = np.stack([pose(rot_z(90.0))])
    add_e = _add_errors(est, gt, pts)
    adi_e = _adi_errors(est, gt, pts)
    assert add_e[0] > 0.05  # chord at 90 deg = r*sqrt(2) ~ 0.0707
    assert adi_e[0] < 1e-3


def test_evaluate_pose_add_thresholds_and_auc():
    rng = np.random.RandomState(2)
    pts = rng.uniform(-0.05, 0.05, (80, 3))
    diameter = 0.1
    gt = [pose(), pose()]
    # errors: 0.001 m (0.01d) and 0.004 m (0.04d)
    est = [pose(t=(0.001, 0.0, 1.0)), pose(t=(0.004, 0.0, 1.0))]
    ev = make_evaluator(pts=pts, diameter=diameter)
    res = ev.evaluate_pose_add([[est]], [[gt]])
    acc = res["ape"][0]
    assert acc["0.02"] == 50.0
    assert acc["0.05"] == 100.0
    assert acc["0.10"] == 100.0
    # AUC thresholds run over [0, 0.1]*diameter (diameter-FRACTION grid,
    # LM6D_REFINE.py: threshold_mean = arange(0, 0.1, dx) * diameter): the
    # curve steps to 0.5 at err/d = 0.01 and to 1.0 at 0.04.
    expected = (0.5 * (0.04 - 0.01) + 1.0 * (0.1 - 0.04)) / 0.1 * 100
    assert abs(acc["auc"] - expected) < 0.5
    np.testing.assert_allclose(acc["errors"], [0.001, 0.004], atol=1e-9)


def test_evaluate_pose_add_uses_adi_for_symmetric_classes():
    ang = np.linspace(0, 2 * np.pi, 180, endpoint=False)
    pts = np.stack([0.05 * np.cos(ang), 0.05 * np.sin(ang), np.zeros_like(ang)], axis=1)
    gt = [pose()]
    est = [pose(rot_z(90.0))]
    res_sym = make_evaluator(classes=("glue",), pts=pts).evaluate_pose_add([[est]], [[gt]])
    res_asym = make_evaluator(classes=("ape",), pts=pts).evaluate_pose_add([[est]], [[gt]])
    assert res_sym["glue"][0]["0.02"] == 100.0   # ADI ~ 0
    assert res_asym["ape"][0]["0.10"] == 0.0     # ADD ~ 0.07 > 0.1*0.1


def test_arp2d_pixel_shift():
    rng = np.random.RandomState(3)
    pts = rng.uniform(-0.01, 0.01, (60, 3))
    gt = np.stack([pose(t=(0.0, 0.0, 1.0))])
    # x offset of 0.03 m at z=1 with fx=100 -> 3 px shift for every point
    # (to first order; points span +-1cm in z so allow tolerance).
    est = np.stack([pose(t=(0.03, 0.0, 1.0))])
    err = _arp2d_errors(est, gt, pts, K)
    assert abs(err[0] - 3.0) < 0.05
    ev = make_evaluator(pts=pts)
    res = ev.evaluate_pose_arp_2d([[list(est)]], [[list(gt)]])
    acc = res["ape"][0]
    assert acc["2"] == 0.0 and acc["5"] == 100.0 and acc["20"] == 100.0
    # AUC over [0, 50] px: step at ~3 px -> (50 - 3)/50.
    assert abs(acc["auc"] - (50 - err[0]) / 50 * 100) < 0.5
