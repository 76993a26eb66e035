"""Asynchronous video writing + headless scene rendering.

The reference's `VideoWriterThread` / `VideoWriterProcess`
(`PMPC/main_parallel_enhanced.py:58-103`) wrap `cv2.VideoWriter` behind a
queue so encoding stays off the control path; here the same contract is a
daemon thread + queue with a None sentinel (a process is pointless — the
producer is the host side of a jitted loop, not a Python hot loop).

Because the physics is pure JAX (no MuJoCo renderer), `render_topdown`
rasterises the logged tray/object trajectory into frames (matplotlib Agg):
tray outline with tilt shading, object track, target cross + tolerance ring
(the reference's in-scene sites, `rob_ctrl.py:144-151`).
"""

from __future__ import annotations

import queue
import threading
import numpy as np


class VideoWriterThread:
    """Queue + daemon thread around an imageio/cv2 sink; None = shutdown."""

    def __init__(self, path: str, fps: int = 30):
        import os
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self.fps = fps
        self.q: "queue.Queue[Optional[np.ndarray]]" = queue.Queue(maxsize=256)
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.frames_written = 0
        self.thread.start()

    def _run(self):
        """cv2.VideoWriter (as the reference uses) with imageio fallback;
        raw .npy frame dump as the last resort."""
        writer = None
        backend = None
        frames_for_npy = []
        try:
            while True:
                frame = self.q.get()
                if frame is None:
                    break
                frame = np.ascontiguousarray(frame)
                if backend is None:
                    backend, writer = self._open(frame.shape)
                if backend == "cv2":
                    import cv2
                    writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
                elif backend == "imageio":
                    writer.append_data(frame)
                else:
                    frames_for_npy.append(frame)
                self.frames_written += 1
        finally:
            if backend == "cv2" and writer is not None:
                writer.release()
            elif backend == "imageio" and writer is not None:
                writer.close()
            elif frames_for_npy:
                np.save(self.path + ".npy", np.stack(frames_for_npy))

    def _open(self, shape):
        h, w = shape[:2]
        try:
            import cv2
            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
            vw = cv2.VideoWriter(self.path, fourcc, self.fps, (w, h))
            if vw.isOpened():
                return "cv2", vw
        except Exception:
            pass
        try:
            import imageio.v2 as imageio
            return "imageio", imageio.get_writer(self.path, fps=self.fps)
        except Exception:
            # No encoder for this container: fall back to GIF, then raw.
            try:
                import imageio.v2 as imageio
                gif = self.path.rsplit(".", 1)[0] + ".gif"
                w = imageio.get_writer(gif, fps=self.fps)
                self.path = gif
                return "imageio", w
            except Exception:
                return "npy", None

    def write(self, frame: np.ndarray):
        self.q.put(np.asarray(frame))

    def close(self):
        self.q.put(None)
        self.thread.join(timeout=30.0)


def render_topdown(ps: np.ndarray, thetas: np.ndarray, target_xy,
                   every: int = 20, tol: float = 0.01,
                   figsize=(4, 3)) -> list[np.ndarray]:
    """Rasterise a logged episode into RGB frames (top-down tray view)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Circle, Rectangle

    ps = np.asarray(ps)
    thetas = np.asarray(thetas)
    frames = []
    for k in range(0, len(ps), every):
        fig, ax = plt.subplots(figsize=figsize, dpi=80)
        ax.add_patch(Rectangle((-0.2, -0.15), 0.4, 0.3, fill=True,
                               facecolor="#d8d8de", edgecolor="k"))
        # tilt shading arrow
        ax.arrow(0, 0, -0.3 * thetas[k, 0], -0.3 * thetas[k, 1],
                 width=0.003, color="#3366cc", alpha=0.6)
        ax.plot(ps[:k + 1, 0], ps[:k + 1, 1], "-", color="#22aa55", lw=1)
        ax.plot(ps[k, 0], ps[k, 1], "o", color="#117733", ms=8)
        tx, ty = float(target_xy[0]), float(target_xy[1])
        ax.plot([tx - 0.02, tx + 0.02], [ty, ty], "r-", lw=1.5)
        ax.plot([tx, tx], [ty - 0.02, ty + 0.02], "r-", lw=1.5)
        ax.add_patch(Circle((tx, ty), tol, fill=False, color="g", alpha=0.5))
        ax.set_xlim(-0.25, 0.25)
        ax.set_ylim(-0.2, 0.2)
        ax.set_aspect("equal")
        ax.set_xticks([])
        ax.set_yticks([])
        fig.tight_layout(pad=0.1)
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3].copy()
        frames.append(buf)
        plt.close(fig)
    return frames


def save_episode_video(path: str, ps, thetas, target_xy, fps: int = 25,
                       every: int = 20) -> int:
    """Render + encode one episode; returns frames written."""
    frames = render_topdown(ps, thetas, target_xy, every=every)
    w = VideoWriterThread(path, fps=fps)
    for f in frames:
        w.write(f)
    w.close()
    return w.frames_written


# ---------------------------------------------------------------------------
# Scene-true software rendering (no GL backend exists in this environment;
# osmesa/egl are absent so MuJoCo's offscreen renderer cannot run). The
# reference renders camera frames of arms/tray/object to mp4
# (`main_parallel_enhanced.py:281-361`, `rob_ctrl.py:367-371`); here the
# same scene is rasterised from the kinematics: both xArm7 chains via
# `physics.chain.fk`, the tray as its tilted support polygon, the object
# on the tray surface — hand-projected through a pinhole camera into
# matplotlib's Agg canvas.
# ---------------------------------------------------------------------------

def _pinhole(eye, at, up=(0.0, 0.0, 1.0)):
    eye = np.asarray(eye, float)
    at = np.asarray(at, float)
    f = at - eye
    f /= np.linalg.norm(f)
    r = np.cross(f, np.asarray(up, float))
    r /= np.linalg.norm(r)
    u = np.cross(r, f)

    def project(P):
        """(..., 3) world -> (..., 2) image plane (+ depth)."""
        d = np.asarray(P, float) - eye
        z = d @ f
        return np.stack([d @ r / z, d @ u / z], axis=-1), z

    return project


def _tilt_rot(theta):
    """World rotation of the tray for tilt [tx, ty] (observe_world
    convention: R = Ry(-tx) @ Rx(ty))."""
    tx, ty = float(theta[0]), float(theta[1])
    cx, sx = np.cos(-tx), np.sin(-tx)
    cy, sy = np.cos(ty), np.sin(ty)
    Ry = np.array([[cx, 0, sx], [0, 1, 0], [-sx, 0, cx]])
    Rx = np.array([[1, 0, 0], [0, cy, -sy], [0, sy, cy]])
    return Ry @ Rx


def render_scene(qLs, qRs, ps, thetas, target_xy, scene=None,
                 every: int = 20, tray_pos=(0.0, 0.0, 0.4),
                 eye=(1.1, -1.3, 1.05), figsize=(5, 4)) -> list[np.ndarray]:
    """Rasterise a full-stack episode into scene-true RGB frames: the two
    arm chains (joint positions from `chain.fk`), the tilted tray
    polygon, the object, and the target marker.

    qLs/qRs (T, 7) joint trajectories (`run_full_stack(record_joints=
    True)`), ps (T, 2) tray-frame object positions, thetas (T, 2) realised
    tilt. `scene` defaults to `rollout.full_stack.make_scene()`.
    """
    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from dart_tpu.physics import chain as chain_mod

    if scene is None:
        from dart_tpu.rollout.full_stack import make_scene
        scene = make_scene()
    qLs, qRs = np.asarray(qLs), np.asarray(qRs)
    ps, thetas = np.asarray(ps), np.asarray(thetas)
    tray_pos = np.asarray(tray_pos, float)
    idx = np.arange(0, len(ps), every)

    @jax.jit
    def joints(qL, qR):
        # joint positions + the grasp/tool point (EE z-offset,
        # `rollout.full_stack.EE_OFFSET`), so the chains visually reach
        # the tray edge they hold
        off = jnp.asarray([0.0, 0.0, 0.125], qL.dtype)

        def pts(params, q):
            f = chain_mod.fk(params, q)
            tool = f.p[-1] + f.R[-1] @ off
            return jnp.concatenate([f.p, tool[None]], axis=0)

        return pts(scene.left, qL), pts(scene.right, qR)

    jL, jR = jax.vmap(joints)(jnp.asarray(qLs[idx]), jnp.asarray(qRs[idx]))
    jL, jR = np.asarray(jL), np.asarray(jR)
    baseL = np.asarray(scene.left.base_pos, float)
    baseR = np.asarray(scene.right.base_pos, float)
    project = _pinhole(eye, at=tray_pos)

    corners_local = np.array([[-0.2, -0.15, 0], [0.2, -0.15, 0],
                              [0.2, 0.15, 0], [-0.2, 0.15, 0]])
    frames = []
    for fi, k in enumerate(idx):
        fig, ax = plt.subplots(figsize=figsize, dpi=80)
        R = _tilt_rot(thetas[k])
        quad, _ = project(corners_local @ R.T + tray_pos)
        ax.fill(quad[:, 0], quad[:, 1], facecolor="#d8d8de",
                edgecolor="k", lw=1.0, zorder=1)
        # target marker on the tray surface
        tgt = R @ np.array([target_xy[0], target_xy[1], 0.03]) + tray_pos
        tq, _ = project(tgt[None])
        ax.plot(tq[0, 0], tq[0, 1], "+", color="r", ms=10, mew=2, zorder=4)
        # object on the tray surface
        obj = R @ np.array([ps[k, 0], ps[k, 1], 0.03]) + tray_pos
        oq, _ = project(obj[None])
        ax.plot(oq[0, 0], oq[0, 1], "o", color="#117733", ms=9, zorder=5)
        # arms: base -> 7 joints -> tool
        for base, J, col in ((baseL, jL[fi], "#3366cc"),
                             (baseR, jR[fi], "#cc7722")):
            pts = np.concatenate([base[None], J], axis=0)
            pq, _ = project(pts)
            ax.plot(pq[:, 0], pq[:, 1], "-", color=col, lw=2.5,
                    solid_capstyle="round", zorder=3)
            ax.plot(pq[1:, 0], pq[1:, 1], "o", color=col, ms=3.5, zorder=3)
        ax.set_xlim(-0.45, 0.45)
        ax.set_ylim(-0.32, 0.38)
        ax.set_aspect("equal")
        ax.set_xticks([])
        ax.set_yticks([])
        ax.set_title(f"t = {k * 0.002:.2f} s", fontsize=9)
        fig.tight_layout(pad=0.1)
        fig.canvas.draw()
        frames.append(np.asarray(fig.canvas.buffer_rgba())[:, :, :3].copy())
        plt.close(fig)
    return frames


def save_scene_video(path: str, qLs, qRs, ps, thetas, target_xy,
                     fps: int = 25, every: int = 20, **kw) -> int:
    """Scene-true episode video (arms + tray + object); returns frames."""
    frames = render_scene(qLs, qRs, ps, thetas, target_xy, every=every, **kw)
    w = VideoWriterThread(path, fps=fps)
    for f in frames:
        w.write(f)
    w.close()
    return w.frames_written
