"""Unified dispatcher — the `PMPC/launch.sh` equivalent.

    python -m dart_tpu.cli {pmpc|rmpc|lmpc|sweep|bench|demo|preview|watch}
        [args...]

`watch` is the live episode viewer (the reference `mujoco.viewer`
stand-in): tail a telemetry ring written by `pmpc --stream` and render
the tray map / tilt / error live in the terminal.

`demo` runs the three canned experiments of the reference launcher
(`launch.sh:34-52`): cube precise, cylinder fast, sphere gentle.
"""

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in {"-h", "--help", "help"}:
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "pmpc":
        from dart_tpu.cli.pmpc import main as m
        return m(rest)
    if cmd == "rmpc":
        from dart_tpu.cli.rmpc import main as m
        return m(rest)
    if cmd == "lmpc":
        from dart_tpu.cli.lmpc import main as m
        return m(rest)
    if cmd == "sweep":
        from dart_tpu.cli.sweep import main as m
        return m(rest)
    if cmd == "preview":
        from dart_tpu.cli.preview import main as m
        return m(rest)
    if cmd == "watch":
        from dart_tpu.cli.watch import main as m
        return m(rest)
    if cmd == "bench":
        import runpy
        sys.argv = ["bench.py"] + rest
        runpy.run_path("bench.py", run_name="__main__")
        return 0
    if cmd == "demo":
        from dart_tpu.cli.pmpc import main as m
        from dart_tpu.io.config import PRESETS
        for name in ("cube_precise", "cylinder_fast", "sphere_gentle"):
            c = PRESETS[name]
            print(f"== {name} ==")
            m(["--target", str(c.target[0]), str(c.target[1]),
               "--object_name", c.object_name, "--mass", str(c.mass),
               "--friction", str(c.friction), "--runtime", "5",
               "--tolerance", str(c.tolerance)])
        return 0
    print(f"unknown command: {cmd}\n{__doc__}")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
