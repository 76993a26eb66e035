"""Scene preview — the `PMPC/object_sim/preview.py` equivalent.

Renders a short open-loop episode of a chosen scene (object sliding under a
held tilt) to a video file, for visually sanity-checking scene parameters.

    python -m dart_tpu.cli.preview --object sphere --mu 0.1 --tilt 0.15 0.0 \
        --out previews/sphere.mp4
"""

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from dart_tpu.physics.object_presets import PRESETS
    p.add_argument("--object", default="cube",
                   choices=["cube", "cylinder", "sphere"] +
                   sorted(PRESETS))
    p.add_argument("--mass", type=float, default=None,
                   help="override mass (presets default to their extracted "
                        "mass; primitives to 1.0 kg)")
    p.add_argument("--mu", type=float, default=0.1)
    p.add_argument("--tilt", type=float, nargs=2, default=[0.12, 0.0])
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--out", default="previews/preview.mp4")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dart_tpu.io.video import save_episode_video
    from dart_tpu.physics import tray_object as to_mod

    dt = 0.002
    T = int(args.seconds / dt)
    if args.object in ("cube", "cylinder", "sphere"):
        params = to_mod.make_params(args.object, args.mass or 1.0, args.mu)
    else:
        from dart_tpu.physics.object_presets import make_preset_params
        params = make_preset_params(args.object, mu=args.mu, mass=args.mass)
    u = jnp.asarray(args.tilt, jnp.float32)

    @jax.jit
    def run():
        def f(s, _):
            s = to_mod.step(s, u, params, dt)
            return s, (s.p, s.theta)

        _, (ps, thetas) = jax.lax.scan(f, to_mod.init_state(), None, length=T)
        return ps, thetas

    ps, thetas = run()
    n = save_episode_video(args.out, np.asarray(ps), np.asarray(thetas),
                           (float(ps[-1, 0]), float(ps[-1, 1])), every=20)
    print(json.dumps({"out": args.out, "frames": n,
                      "final_p": [float(ps[-1, 0]), float(ps[-1, 1])]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
