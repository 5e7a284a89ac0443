#!/bin/bash
# Hardware measurement session for the round-3 pickup list. Run phases in
# order; each phase is bounded and small-first so a failure surfaces at
# the cheapest scale (the round-2 outage began with a long kernel killed
# client-side — keep individual device programs short).
#
#   bash tools/tpu_session.sh phase1     # gates + quick bench
#   bash tools/tpu_session.sh phase2     # FPS hardware validation + timing
#   bash tools/tpu_session.sh phase3     # ordering / MXU / SUB sweeps
#   bash tools/tpu_session.sh phase4     # full bench + stress configs
set -u
cd "$(dirname "$0")/.."
mkdir -p tpu_runs
LOG=tpu_runs/session_$(date +%Y%m%d_%H%M%S)_$1.log
exec > >(tee "$LOG") 2>&1
date

phase1() {
  echo "== sanity =="
  timeout 300 python -c "import jax,jax.numpy as jnp; print(jax.devices()); print(float(jnp.sum(jnp.ones((256,256)))))" || exit 1
  echo "== entry compile check =="
  timeout 600 python -c "import jax,__graft_entry__; fn,a=__graft_entry__.entry(); jax.jit(fn)(*a).block_until_ready(); print('ENTRY OK')" || exit 1
  echo "== quick bench (1 rep) =="
  FLOODER_BENCH_REPS=1 timeout 1200 python bench.py
  echo "== stage split =="
  FLOODER_BENCH_REPS=1 timeout 1200 python bench.py --stages
}

phase2() {
  echo "== FPS parity on hardware (small) =="
  FLOODER_TEST_TPU=1 timeout 900 python -m pytest tests/test_landmarks.py::test_pallas_fps_matches_xla_on_tpu -x -q
  echo "== FPS timing 1M/1k =="
  timeout 900 python - <<'EOF'
import time, jax, jax.numpy as jnp
from flooder_tpu import generate_swiss_cheese_points
from flooder_tpu.ops.pallas_fps import pallas_farthest_point_sampling
pts,_,_ = generate_swiss_cheese_points(1_000_000, k=6, seed=42)
pts = jnp.asarray(pts, jnp.float32)
idx = pallas_farthest_point_sampling(pts, 1000, 0)  # compile
idx.block_until_ready()
for rep in range(3):
    t0=time.perf_counter(); pallas_farthest_point_sampling(pts, 1000, 0).block_until_ready()
    print(f"fps 1M/1k rep{rep}: {time.perf_counter()-t0:.4f}s")
EOF
  echo "== FPS timing 10M/2k =="
  timeout 900 python - <<'EOF'
import time, jax, jax.numpy as jnp
from flooder_tpu import generate_swiss_cheese_points
from flooder_tpu.ops.pallas_fps import pallas_farthest_point_sampling
pts,_,_ = generate_swiss_cheese_points(10_000_000, k=6, seed=42)
pts = jnp.asarray(pts, jnp.float32)
pallas_farthest_point_sampling(pts, 2000, 0).block_until_ready()
t0=time.perf_counter(); pallas_farthest_point_sampling(pts, 2000, 0).block_until_ready()
print(f"fps 10M/2k: {time.perf_counter()-t0:.4f}s")
EOF
}

phase3() {
  # The 20-combo kernel-variant sweep ran on 2026-08-18
  # (tpu_runs/sweep_r04.jsonl + session logs): the shipped default won
  # every flag decision (kd +0.04 s < its 0.1 s threshold; MXU,
  # two-phase refresh, SUB=256, RT=256 all slower) and the losing code
  # paths were DELETED. This phase is now a confirmation bench of the
  # one shipped configuration; the JSONL append protocol is kept so a
  # future geometry change can extend the same decision record.
  SWEEP=tpu_runs/sweep_r04.jsonl
  for v in ""; do
    echo "== bench sweep: [$v] =="
    out=$(env $v FLOODER_BENCH_REPS=2 timeout 1500 python bench.py)
    echo "$out"
    # pass values via the environment, not source splicing: bench output
    # containing quotes/backslashes must not corrupt the parser, and a
    # combo with no JSON line must be LOUD (sweep_decide would otherwise
    # silently decide from an incomplete row set)
    OUT="$out" V="$v" SHA="$(git rev-parse --short HEAD)" python - >> "$SWEEP" <<'PYEOF'
import json, os, sys
for l in os.environ.get("OUT", "").strip().splitlines():
    try:
        j = json.loads(l)
    except Exception:
        continue
    j["env"] = os.environ.get("V", "")
    # sweep_decide only trusts rows measured at the current HEAD: a rerun
    # after a kernel fix must not mix in timings of deleted code
    j["sha"] = os.environ.get("SHA", "")
    print(json.dumps(j))
    break
else:
    print(f"WARNING: no JSON line from combo [{os.environ.get('V','')}]",
          file=sys.stderr)
PYEOF
  done
  echo "== sweep decision =="
  python tools/sweep_decide.py "$SWEEP" || true
}

phase4() {
  # Run everything under the phase-3 winner's env (empty when the
  # shipped default won or no sweep has been parsed at this HEAD), so
  # the decisive numbers land without a human between phases. The
  # winner's flags still get folded into the shipped defaults (and the
  # losers deleted) afterwards — this just stops phase4 from measuring a
  # configuration phase3 already beat.
  WINNER=$(python tools/sweep_decide.py --winner-env tpu_runs/sweep_r04.jsonl 2>/dev/null || echo "")
  echo "phase4 env: [${WINNER}]"
  echo "== full bench (3 reps) =="
  env $WINNER timeout 1800 python bench.py
  echo "== stage split under the winner =="
  env $WINNER FLOODER_BENCH_REPS=1 timeout 1200 python bench.py --stages || true
  echo "== profiler trace of the headline config (post-hoc analysis) =="
  timeout 900 python - <<'EOF' || true
import numpy as np
from flooder_tpu import generate_swiss_cheese_points
pts, _, _ = generate_swiss_cheese_points(1_000_000, k=6, seed=42)
np.save("/tmp/cheese_1m.npy", np.asarray(pts, np.float32))
EOF
  env $WINNER timeout 1200 python -m flooder_tpu.cli --input-file /tmp/cheese_1m.npy \
    --num-landmarks 1000 --trace-dir tpu_runs/trace_r04 \
    --stats-json tpu_runs/cli_stats_r04.json || true
  echo "== 2M x 1k (BASELINE.json north-star config) =="
  env $WINNER timeout 1500 python bench.py --points 2000000 --landmarks 1000 --reps 2
  echo "== 2M x 10k stress =="
  env $WINNER timeout 2400 python bench.py --points 2000000 --landmarks 10000 --reps 1
  echo "== example_02 (1M torus, 2k landmarks, FPS/complex/PH split) =="
  env $WINNER timeout 1800 python examples/example_02_torus_3d.py --reps 2 || true
  echo "== example_01 (incl. 10M row; host-Alpha capped at 100k) =="
  env $WINNER timeout 3600 python examples/example_01_cheese_3d.py --reps 1 \
    --alpha-max-n 100000 || true
  echo "== example_03 (40M 2-D figure-eight) =="
  env $WINNER timeout 3600 python examples/example_03_figure_eight_2d.py || true
}

"$1"
date
