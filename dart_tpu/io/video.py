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
