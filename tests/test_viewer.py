"""Interactive-viewer smoke tests (SDL dummy driver; no display).

This environment has no GL context (no X server, no OSMesa), so the GL
calls themselves run against a recording stub — everything else (pygame
init, FK precompute, the full event/control surface, frame stepping, the
draw-call sequence) executes for real.  Reference: amc_parser/viewer.py.
"""

import os
import types

import numpy as np
import pytest

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def viewer():
    pygame = pytest.importorskip("pygame")
    from gpmdm_tpu.data.amc_asf import parse_amc, parse_asf
    from gpmdm_tpu.viz.viewer import Viewer

    skel = parse_asf(os.path.join(FIX, "tiny.asf"))
    motion = parse_amc(os.path.join(FIX, "tiny.amc"), skel)
    pygame.init()
    v = Viewer(skel, motion, fps=30)
    yield v
    pygame.quit()


def test_viewer_precomputes_all_frames(viewer):
    assert viewer.positions.ndim == 3  # (frames, joints, 3)
    assert len(viewer.positions) > 0
    assert np.isfinite(viewer.positions).all()


def test_viewer_event_surface(viewer):
    """Drive every control through synthetic pygame events."""
    import pygame
    from pygame.locals import (
        K_ESCAPE, K_RIGHT, K_SPACE, K_e, K_r, K_w, KEYDOWN,
        MOUSEBUTTONDOWN, MOUSEBUTTONUP, MOUSEMOTION, QUIT,
    )

    def key(k):
        return pygame.event.Event(KEYDOWN, key=k)

    assert viewer.playing
    assert viewer.process_event(key(K_SPACE)) and not viewer.playing

    f0 = viewer.frame
    viewer.process_event(key(K_RIGHT))
    assert viewer.frame == (f0 + 1) % len(viewer.positions)

    t0 = viewer.trans.copy()
    viewer.process_event(key(K_w))
    viewer.process_event(key(K_e))
    assert viewer.trans[1] == t0[1] - 0.2 and viewer.trans[2] == t0[2] - 0.4

    # mouse-drag rotation
    r0 = viewer.rot.copy()
    viewer.process_event(pygame.event.Event(MOUSEBUTTONDOWN, button=1))
    viewer.process_event(pygame.event.Event(MOUSEMOTION, rel=(10, -5)))
    viewer.process_event(pygame.event.Event(MOUSEBUTTONUP, button=1))
    assert viewer.rot[1] == pytest.approx(r0[1] + 3.0)
    assert viewer.rot[0] == pytest.approx(r0[0] - 1.5)

    # reset restores the camera
    viewer.process_event(key(K_r))
    assert tuple(viewer.rot) == (20.0, -30.0)
    assert tuple(viewer.trans) == (0.0, -1.0, -6.0)

    # escape / window-close quit
    assert not viewer.process_event(key(K_ESCAPE))
    assert not viewer.process_event(pygame.event.Event(QUIT))


def test_viewer_step_and_speed(viewer):
    viewer.playing = True
    viewer.speed = 2.0
    f0 = viewer.frame
    viewer.step()
    assert viewer.frame == (f0 + 2) % len(viewer.positions)
    viewer.playing = False
    f1 = viewer.frame
    viewer.step()
    assert viewer.frame == f1


def test_viewer_draw_sequence(viewer):
    """Render two frames against a recording GL stub: the draw path must
    emit a point per joint and a line segment per bone, with valid
    coordinates."""
    calls = []

    class _GL(types.SimpleNamespace):
        def __getattr__(self, name):
            if name.isupper() or name.startswith("GL_"):
                return 0

            def record(*args):
                calls.append((name, args))

            return record

    gl = _GL()
    for _ in range(2):
        viewer.step()
        viewer._draw_frame(gl)

    names = [n for n, _ in calls]
    n_joints = viewer.positions.shape[1]
    n_bones = int(np.sum(np.asarray(viewer.skeleton.parent) >= 0))
    assert names.count("glVertex3f") == 2 * (n_joints + 2 * n_bones)
    verts = [a for n, a in calls if n == "glVertex3f"]
    assert np.isfinite(np.asarray(verts, dtype=float)).all()


def test_interactive_latent_html(tmp_path):
    """The zero-dependency interactive 3D latent widget embeds every class's
    points and the trajectory as valid JSON inside a complete HTML document
    (plotly-parity artifact; reference load_gpmdm.ipynb cell 2)."""
    import json
    import re

    from gpmdm_tpu import GPMDM
    from gpmdm_tpu.data import synthetic
    from gpmdm_tpu.viz.html3d import write_latent_html

    tr, tl, _, _ = synthetic.make_dataset(
        n_classes=2, n_train_seqs=2, n_test_seqs=1, seq_len=15, D=6, seed=2
    )
    m = GPMDM(D=6, d=2, n_classes=2, dtype="float64")
    for Y, c in zip(tr, tl):
        m.add_data(Y, c)
    m.init_X()
    traj = np.asarray(m.params.X)[:7]
    p = write_latent_html(m, tmp_path / "latent.html",
                          class_names=["walk", "run"], trajectory=traj)
    html = p.read_text()
    assert html.startswith("<!DOCTYPE html>") and "</html>" in html
    groups = json.loads(re.search(r"const GROUPS = (\[.*?\]);", html).group(1))
    assert [g["name"] for g in groups] == ["walk", "run"]
    assert sum(len(g["pts"]) for g in groups) == m.layout.Ny
    assert all(len(pt) == 3 for g in groups for pt in g["pts"])
    tr_pts = json.loads(re.search(r"const TRAJ = (\[.*?\]);", html).group(1))
    assert len(tr_pts) == 7
    # all coordinates normalized into the renderer's unit box
    flat = [abs(v) for g in groups for pt in g["pts"] for v in pt]
    assert max(flat) <= 1.0 + 1e-9
