"""Data layer: ASF/AMC parsing, batched FK vs per-frame Joint-tree FK,
MotionCapture tabular exports, registry constants, split generator."""

from pathlib import Path

import numpy as np
import pytest

from gpmdm_tpu.data import (
    ALL_JOINTS,
    CMU_MOCAP_LENGTH_TO_METERS,
    REDUCED_JOINTS,
    WALKING_SIMPLIFIED_JOINTS,
    MotionCapture,
    build_joint_tree,
    parse_amc,
    parse_asf,
)
from gpmdm_tpu.data import registry
from gpmdm_tpu.data.fk import euler_xyz_mat, forward_kinematics

FIX = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def skel():
    return parse_asf(FIX / "tiny.asf")


@pytest.fixture(scope="module")
def motion(skel):
    return parse_amc(FIX / "tiny.amc", skel)


def test_parse_asf_structure(skel):
    assert skel.names == ("root", "upperleg", "lowerleg", "foot")
    assert list(skel.parent) == [-1, 0, 1, 2]
    np.testing.assert_allclose(skel.length[1], 2.0 * CMU_MOCAP_LENGTH_TO_METERS)
    assert skel.dof[0] == ("tx", "ty", "tz", "rx", "ry", "rz")
    assert skel.dof[2] == ("rx",)
    assert skel.dof[3] == ("rx", "rz")
    np.testing.assert_allclose(skel.axis_deg[1], [0, 0, 20])
    # limits mapped to per-axis rows: foot has rx and rz
    np.testing.assert_allclose(skel.limits_deg[3][0], [-45, 45])
    np.testing.assert_allclose(skel.limits_deg[3][1], [0, 0])
    np.testing.assert_allclose(skel.limits_deg[3][2], [-20, 20])


def test_parse_amc_channels(skel, motion):
    assert motion.n_frames == 3
    # root translation in meters, rotation in degrees
    np.testing.assert_allclose(
        motion.channels["root"][0, :3],
        np.array([1.0, 15.0, 2.0]) * CMU_MOCAP_LENGTH_TO_METERS,
    )
    np.testing.assert_allclose(motion.channels["root"][0, 3:], [5.0, -3.0, 0.5])
    np.testing.assert_allclose(motion.channels["lowerleg"][:, 0], [20.0, 22.0, 24.0])
    frame0 = motion.frame(0)
    assert set(frame0) == {"root", "upperleg", "lowerleg", "foot"}


def test_euler_convention_matches_scipy():
    """Static-xyz convention: R = Rz @ Ry @ Rx (transforms3d 'sxyz', what the
    reference uses at amc_parser.py:43)."""
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(0)
    angles = rng.uniform(-np.pi, np.pi, size=(10, 3))
    got = euler_xyz_mat(angles)
    want = Rotation.from_euler("xyz", angles).as_matrix()  # extrinsic xyz
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_batched_fk_matches_joint_tree(skel, motion):
    """Vectorized FK == reference-style per-frame recursive Joint.set_motion."""
    out = forward_kinematics(skel, motion)
    pos = out["positions"]  # (T, J, 3)
    joints = build_joint_tree(skel)
    for t in range(motion.n_frames):
        joints["root"].set_motion(motion.frame(t))
        for j, name in enumerate(skel.names):
            np.testing.assert_allclose(
                pos[t, j], joints[name].coordinate[:, 0], atol=1e-12,
                err_msg=f"frame {t} joint {name}",
            )


def test_fk_zero_pose(skel):
    """With zero rotations, each bone extends length * direction from its
    parent (rotation matrices compose to identity)."""
    from gpmdm_tpu.data.amc_asf import Motion

    zero = Motion(
        channels={"root": np.zeros((1, 6))},
        n_frames=1,
    )
    pos = forward_kinematics(skel, zero)["positions"][0]
    np.testing.assert_allclose(pos[0], 0.0)
    np.testing.assert_allclose(
        pos[1], skel.length[1] * skel.direction[1], atol=1e-12
    )
    np.testing.assert_allclose(
        pos[2], pos[1] + skel.length[2] * skel.direction[2], atol=1e-12
    )


def test_motioncapture_dataframe_and_numpy():
    mc = MotionCapture(FIX / "tiny.asf", FIX / "tiny.amc", fps=120)
    df = mc.as_dataframe()
    assert list(df.columns[:2]) == ["frame", "time"]
    assert "upperleg_rx" in df.columns and "foot_rz" in df.columns
    assert len(df) == 3
    np.testing.assert_allclose(df["time"].to_numpy(), np.arange(3) / 120)
    arr = mc.as_numpy()
    assert arr.shape == (3, 12)  # 6 root + 3 + 1 + 2
    assert arr.dtype == np.float32
    cols = mc.get_columns_for_joints(["upperleg", "foot"])
    assert cols == ["upperleg_rx", "upperleg_ry", "upperleg_rz", "foot_rx", "foot_rz"]
    sel = mc.select_joints(["lowerleg"])
    np.testing.assert_allclose(sel[:, 0], [20.0, 22.0, 24.0])
    assert mc.positions().shape == (3, 4, 3)


def test_joint_subset_constants():
    assert len(ALL_JOINTS) == 31
    assert len(REDUCED_JOINTS) == 27
    # 19 joints -> 35 DOFs on the CMU skeleton (reference select_joints.py:50)
    assert len(WALKING_SIMPLIFIED_JOINTS) == 19
    assert "root" not in WALKING_SIMPLIFIED_JOINTS
    assert "lfemur" in WALKING_SIMPLIFIED_JOINTS


def test_registry_ids_match_reference():
    n_walk = sum(len(list(v)) for v in registry.WALK_TRIAL_IDS.values())
    n_run = sum(len(list(v)) for v in registry.RUN_TRIAL_IDS.values())
    assert n_walk == 31 and n_run == 27  # paper §4.1
    n_train = sum(len(list(v)) for v in registry.WALK_TRIAL_IDS_TRAIN.values()) + sum(
        len(list(v)) for v in registry.RUN_TRIAL_IDS_TRAIN.values()
    )
    n_test = sum(len(list(v)) for v in registry.WALK_TRIAL_IDS_TEST.values()) + sum(
        len(list(v)) for v in registry.RUN_TRIAL_IDS_TEST.values()
    )
    assert n_train == 19 and n_test == 39  # frozen split, mocap_labels.py:18-30
    p = registry.amc_path(7, 3)
    assert p.name == "07_03.amc" and p.parent.name == "07"
    assert registry.asf_path(35).name == "35.asf"


def test_split_generator_properties():
    train, test = registry.gen_test_train_split(registry.WALK_TRIAL_IDS, 1 / 3, seed=1)
    # every subject has at least one training trial
    assert set(train) == set(registry.WALK_TRIAL_IDS)
    all_pairs = {
        (s, t) for s, ts in registry.WALK_TRIAL_IDS.items() for t in ts
    }
    got = {(s, t) for s, ts in train.items() for t in ts} | {
        (s, t) for s, ts in test.items() for t in ts
    }
    assert got == all_pairs
    # no overlap
    assert not (
        {(s, t) for s, ts in train.items() for t in ts}
        & {(s, t) for s, ts in test.items() for t in ts}
    )
