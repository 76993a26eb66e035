"""Pre-warm bench.py's persistent compile cache (VERDICT r2 next-1).

The whole-solve kernel programs bench.py times can take minutes to compile
cold through the remote-TPU tunnel; the driver's capture step should never
pay that. Run this once (any time the TPU is reachable) and subsequent
`python bench.py` runs hit the persistent cache in `.jax_cache/`.

Implementation: the prewarm IS a bench run — that is the only way to
guarantee the cache keys match exactly what bench.py will compile. The JSON
line is printed to stderr for inspection; stdout stays clean.
"""

import os
import subprocess
import sys

here = os.path.dirname(os.path.abspath(__file__))
env = dict(os.environ)
env.setdefault("DART_BENCH_DEADLINE", "3000")       # cold compiles are slow
env.setdefault("DART_BENCH_PROBE_DEADLINE", "300")
r = subprocess.run([sys.executable, os.path.join(here, "..", "bench.py")],
                   capture_output=True, text=True, env=env)
sys.stderr.write(r.stderr)
sys.stderr.write(f"\nbench_prewarm: rc={r.returncode} line={r.stdout}")
sys.exit(r.returncode)
