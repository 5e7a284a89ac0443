#!/bin/bash
# Hardware measurement session. Every step is bounded, small-first, and
# separated by a PATIENT health probe so any wedge is self-diagnosing
# (the log records the last-good step) instead of round-killing.
#
# Operational model learned from rounds 1-4 (tpu_runs/session_*.log):
# the accelerator tunnel takes ~2-5 minutes to accept a NEW client after
# a heavy client disconnects. A single short probe misreads that window
# as a dead chip (three straight rc=3 driver benches). Never kill an
# in-flight device program client-side (the round-2 multi-hour outage);
# bound runs generously instead.
#
#   bash tools/tpu_session.sh r5quick     # gates + quick bench + stages
#   bash tools/tpu_session.sh r5sweep     # kd-vs-hilbert decision sweep
#   bash tools/tpu_session.sh r5scale     # 2M/10M/2Mx10k/40M scale tier
#   bash tools/tpu_session.sh r5extra     # CLI stats, 1x1 mesh, examples
#   bash tools/tpu_session.sh r5compile   # gates + instrumented cold/warm diag
set -u
cd "$(dirname "$0")/.."
mkdir -p tpu_runs
LOG=tpu_runs/session_$(date +%Y%m%d_%H%M%S)_$1.log
exec > >(tee "$LOG") 2>&1
date

# Patient probe: up to 6 attempts across ~16 min. Labels record the
# preceding step so the log shows exactly which step wedged the chip.
probe() {
  local label="$1"
  for i in 1 2 3 4 5 6; do
    if timeout 180 python -c "import jax,jax.numpy as jnp; jnp.sum(jnp.ones((64,64))).block_until_ready()" >/dev/null 2>&1; then
      echo "PROBE OK [$label] attempt $i $(date -u +%H:%M:%S)"
      return 0
    fi
    echo "PROBE retry $i [$label] $(date -u +%H:%M:%S); sleeping 90s"
    sleep 90
  done
  echo "PROBE FAILED [$label] — chip did not recover in ~16 min"
  return 1
}

r5quick() {
  probe "session-start" || exit 1
  echo "== entry compile check =="
  timeout 600 python -c "import jax,__graft_entry__; fn,a=__graft_entry__.entry(); jax.jit(fn)(*a).block_until_ready(); print('ENTRY OK')"
  probe "entry-check"
  echo "== quick bench (1 rep) =="
  FLOODER_BENCH_REPS=1 timeout 2400 python bench.py
  probe "quick-bench"
  echo "== stage split (1 rep) =="
  FLOODER_BENCH_REPS=1 timeout 2400 python bench.py --stages
  probe "stage-split"
}

r5sweep() {
  # DECIDED 2026-08-19 (tpu_runs/sweep_r05.jsonl, session ..._073919):
  # kd witness ordering 1.3647 s (vs_baseline 0.975) beat Hilbert's
  # 1.4229 (1.016) with 5 reps each in one session; kd is now the
  # unconditional default and the env knob is gone. This phase remains
  # as a confirmation bench: it re-measures the shipped default and
  # appends a sha-stamped row.
  SWEEP=tpu_runs/sweep_r05.jsonl
  probe "sweep-start" || exit 1
  for v in ""; do
    echo "== bench sweep: [$v] =="
    out=$(env $v FLOODER_BENCH_REPS=5 timeout 2400 python bench.py)
    echo "$out"
    OUT="$out" V="$v" SHA="$(git rev-parse --short HEAD)" python - >> "$SWEEP" <<'PYEOF'
import json, os, sys
for l in os.environ.get("OUT", "").strip().splitlines():
    try:
        j = json.loads(l)
    except Exception:
        continue
    j["env"] = os.environ.get("V", "")
    j["sha"] = os.environ.get("SHA", "")
    print(json.dumps(j))
    break
else:
    print(f"WARNING: no JSON line from combo [{os.environ.get('V','')}]",
          file=sys.stderr)
PYEOF
    probe "sweep-combo[$v]"
  done
  echo "== sweep decision =="
  python tools/sweep_decide.py "$SWEEP" || true
}

r5scale() {
  # Each config is its own bounded bench.py invocation (which itself
  # probes patiently, isolates the measurement in a subprocess, and
  # retries once), with a labeled probe between configs.
  probe "scale-start" || exit 1
  echo "== 2M x 1k (BASELINE.json north-star config) =="
  timeout 3000 python bench.py --points 2000000 --landmarks 1000 --reps 2 --timeout 1200
  probe "2m-x-1k"
  echo "== 10M x 1k =="
  timeout 3000 python bench.py --points 10000000 --landmarks 1000 --reps 1 --timeout 1500
  probe "10m-x-1k"
  echo "== 2M x 10k stress =="
  timeout 3600 python bench.py --points 2000000 --landmarks 10000 --reps 1 --timeout 2000
  probe "2m-x-10k"
  echo "== example_03 (40M 2-D figure-eight) =="
  timeout 3600 python examples/example_03_figure_eight_2d.py || true
  probe "ex03-40m"
}

r5compile() {
  # Verify + diagnose session for the cold-compile work: driver gates,
  # then FLOODER_TIMING-instrumented runs at 1M/10M/40M to attribute
  # cold and warm time per pipeline stage (the r5scale session measured
  # 317.8 s cold at 40M that the work-volume model prices at ~0.3 s of
  # kernel; the kd-order fori_loop rewrite + engine cache attack that).
  probe "session-start" || exit 1
  echo "== entry compile check (TPU) =="
  timeout 900 python -c "import jax,__graft_entry__; fn,a=__graft_entry__.entry(); jax.jit(fn)(*a).block_until_ready(); print('ENTRY OK')"
  probe "entry-check"
  echo "== dryrun_multichip(8) gate (CPU mesh, no chip) =="
  timeout 600 python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8); print('DRYRUN OK')"
  echo "== 1M x 1k instrumented (cold + warm attribution) =="
  FLOODER_TIMING=1 FLOODER_BENCH_REPS=2 timeout 2400 python bench.py
  probe "1m-diag"
  echo "== 1M x 1k clean headline (engine cache in effect) =="
  FLOODER_BENCH_REPS=5 timeout 2400 python bench.py
  probe "1m-clean"
  echo "== 10M x 1k instrumented (2 reps: warm gap attribution) =="
  FLOODER_TIMING=1 timeout 3000 python bench.py --points 10000000 --landmarks 1000 --reps 2 --timeout 2400
  probe "10m-diag"
  echo "== example_03 40M 2-D instrumented (cold path) =="
  FLOODER_TIMING=1 timeout 3600 python examples/example_03_figure_eight_2d.py || true
  probe "ex03-40m-diag"
  echo "== 2M x 1k clean (north star re-measure) =="
  timeout 2400 python bench.py --points 2000000 --landmarks 1000 --reps 3 --timeout 1200
  probe "2m-clean"
}

r5scale2() {
  # Scale-tier re-measure at the post-fix tree (kd fori_loop + engine
  # cache + early D2H): small-first, probes between, instrumented 40M.
  probe "session-start" || exit 1
  echo "== 1M x 1k clean headline (5 reps) =="
  FLOODER_BENCH_REPS=5 timeout 2400 python bench.py
  probe "1m"
  echo "== 2M x 1k north star (3 reps) =="
  timeout 2400 python bench.py --points 2000000 --landmarks 1000 --reps 3 --timeout 1200
  probe "2m"
  echo "== 2M x 10k stress (1 rep) =="
  timeout 3600 python bench.py --points 2000000 --landmarks 10000 --reps 1 --timeout 2000
  probe "2m10k"
  echo "== example_03 40M 2-D (instrumented; kd OOM fix validation) =="
  FLOODER_TIMING=1 timeout 3600 python examples/example_03_figure_eight_2d.py || true
  probe "ex03-40m"
}

r5examples() {
  # Examples re-run at the post-fix tree with warm compile caches: the
  # r5extra example numbers were cold (and ex02's first rep shared the
  # chip with a stray process — see STATUS.md).
  probe "session-start" || exit 1
  echo "== example_02 (1M torus, 2k landmarks, 2 reps) =="
  timeout 1800 python examples/example_02_torus_3d.py --reps 2 || true
  probe "ex02"
  echo "== example_01 (Alpha capped at 100k, 1 rep) =="
  timeout 3600 python examples/example_01_cheese_3d.py --reps 1 \
    --alpha-max-n 100000 || true
  probe "ex01"
  echo "== example_03 (40M 2-D) =="
  timeout 3600 python examples/example_03_figure_eight_2d.py || true
  probe "ex03"
}

r5pack() {
  # Packed-admission decision sweep: the admission matrix's D2H is
  # bandwidth-bound (tools/tunnel_rtt_probe.py: ~22 MB/s + 24 ms floor),
  # so u8 (1 B/entry) and f16 (2 B/entry) should beat the legacy
  # bool+f32 pair (5 B/entry). Head-to-head in ONE session, 5 reps each,
  # sha-stamped rows; adopt-the-winner rule applies.
  SWEEP=tpu_runs/sweep_r05.jsonl
  probe "pack-start" || exit 1
  for v in "FLOODER_ADMISSION=f32" "FLOODER_ADMISSION=f16" "FLOODER_ADMISSION=u8"; do
    echo "== bench sweep: [$v] =="
    out=$(env $v FLOODER_BENCH_REPS=5 timeout 2400 python bench.py)
    echo "$out"
    OUT="$out" V="$v" SHA="$(git rev-parse --short HEAD)" python - >> "$SWEEP" <<'PYEOF'
import json, os, sys
for l in os.environ.get("OUT", "").strip().splitlines():
    try:
        j = json.loads(l)
    except Exception:
        continue
    j["env"] = os.environ.get("V", "")
    j["sha"] = os.environ.get("SHA", "")
    print(json.dumps(j))
    break
else:
    print(f"WARNING: no JSON line from combo [{os.environ.get('V','')}]",
          file=sys.stderr)
PYEOF
    probe "pack-combo[$v]"
  done
  echo "== 10M x 1k instrumented under the default (prep-stage check) =="
  FLOODER_TIMING=1 timeout 3000 python bench.py --points 10000000 --landmarks 1000 --reps 1 --timeout 1500
  probe "10m-pack"
}

r5rtt() {
  # Decompose the prep-stage 0.24 s: tunnel D2H latency-vs-bandwidth
  # profile, then a timing-instrumented headline rep at HEAD for the
  # stage split the optimization targets.
  probe "rtt-start" || exit 1
  echo "== tunnel D2H profile =="
  timeout 900 python tools/tunnel_rtt_probe.py
  probe "rtt-probe"
  echo "== 1M x 1k instrumented (1 rep, stage split at HEAD) =="
  FLOODER_TIMING=1 FLOODER_BENCH_REPS=1 timeout 2400 python bench.py
  probe "1m-diag"
}

r5extra() {
  probe "extra-start" || exit 1
  echo "== CLI stats on the healthy chip (regenerates the r04 artifact) =="
  timeout 900 python - <<'EOF'
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
from flooder_tpu import generate_swiss_cheese_points
pts, _, _ = generate_swiss_cheese_points(1_000_000, k=6, seed=42)
np.save("/tmp/cheese_1m.npy", np.asarray(pts, np.float32))
EOF
  timeout 1800 python -m flooder_tpu.cli --input-file /tmp/cheese_1m.npy \
    --num-landmarks 1000 --stats-json tpu_runs/cli_stats_r05.json || true
  probe "cli-stats"
  echo "== 1x1 mesh compiled-kernel parity on TPU =="
  FLOODER_TEST_TPU=1 timeout 1800 python -m pytest \
    "tests/test_sharding.py::test_pallas_mesh_1x1_compiled_on_tpu" -x -q
  probe "mesh-1x1"
  echo "== example_02 (1M torus, 2k landmarks, FPS/complex/PH split) =="
  timeout 1800 python examples/example_02_torus_3d.py --reps 2 || true
  probe "ex02"
  echo "== example_01 (incl. 10M row; host-Alpha capped at 100k) =="
  timeout 3600 python examples/example_01_cheese_3d.py --reps 1 \
    --alpha-max-n 100000 || true
  probe "ex01"
}

"$1"
date
