#!/bin/bash
# One-shot TPU validation queue for this round (run when the axon tunnel is
# up). Each step logs to /tmp/tpuval/; safe to re-run — the per-host jit
# cache makes repeats fast.
set -x
mkdir -p /tmp/tpuval
cd "$(dirname "$0")/.."

# 0. is the chip reachable at all?
timeout 300 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
(jnp.ones((256,256))@jnp.ones((256,256))).block_until_ready()
print('TPU OK')" 2>&1 | tail -2 | tee /tmp/tpuval/00_probe.log || exit 1

# 1. kernel + precision parity (includes the bf16 regression tests)
GISNAV_TPU_PARITY=1 timeout 3000 python -m pytest tests/test_tpu_parity.py \
    -q 2>&1 | tail -5 | tee /tmp/tpuval/01_parity.log

# 2. accuracy sweep at the VALIDATED config. CPU baseline (must match):
#    alt 500 x 8 yaws -> 8/8, mean 1.49 m, max 2.56 m. (Lower altitudes are
#    a synthetic-world resolution artifact, see tests/test_cached_rotation.)
timeout 3000 python tools/sweep_headline.py --weights harris_lg5 \
    --hw 480 640 --kp 512 --depth 5 --alts 500 \
    --out /tmp/tpuval/02_sweep_640.json 2>&1 | tail -3

# 3. accuracy sweep at the HEADLINE config (1080p/2048kp/learned_lg9)
timeout 6000 python tools/sweep_headline.py --alts 500 \
    --out /tmp/tpuval/03_sweep_headline.json 2>&1 | tail -3

# 4. headline bench (both configs in one JSON line)
timeout 6000 python bench.py 2>&1 | tail -1 | tee /tmp/tpuval/04_bench.json

# 5. per-stage profile after the kernel/select rewrites
timeout 3000 python tools/bench_stages.py --what all 2>&1 \
    | tee /tmp/tpuval/05_stages.log

echo "=== DONE; see /tmp/tpuval/ ==="
