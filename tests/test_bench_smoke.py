"""bench.py smoke test — the driver runs `python bench.py` at round end;
this guards the default path against import/arg regressions."""

import json
import os
import subprocess
import sys


def test_bench_default_path_runs_tiny():
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=['bench.py','256','2'];"
         "import bench; bench.main()"],
        capture_output=True, text=True, timeout=400, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    obj = json.loads(line)
    assert obj["unit"] == "frames/s"
    assert obj["value"] > 0
    assert "vs_baseline" in obj
