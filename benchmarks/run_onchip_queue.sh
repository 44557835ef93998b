#!/bin/bash
# Round-3d pending on-chip queue (CLAUDE.md): run everything that was
# blocked by the axon tunnel outage, saving outputs under /tmp/r3d_onchip.
# Each stage is independently resumable; re-running skips completed stages
# (presence of the stage's .done marker).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r3d_onchip
mkdir -p "$OUT"

stage() {
  local name=$1; shift
  if [ -f "$OUT/$name.done" ]; then echo "== $name: already done"; return 0; fi
  echo "== $name: running ($(date +%H:%M:%S))"
  if "$@" > "$OUT/$name.log" 2>&1; then
    touch "$OUT/$name.done"; echo "== $name: OK"
  else
    echo "== $name: FAILED (see $OUT/$name.log, tail follows)"
    tail -5 "$OUT/$name.log"
  fi
}

# 0. aliveness
stage alive timeout 300 python -u -c "
import jax
print(jax.devices())
import jax.numpy as jnp
(jnp.ones((8,8))+1).block_until_ready()
print('TPU-OK')"
[ -f "$OUT/alive.done" ] || { echo 'TPU still down; aborting'; exit 1; }

# 1. coincident-family rates + on-chip equivalence asserts
stage probe_coincident timeout 3000 python benchmarks/probe_coincident_r3d.py

# 2. bench headline (expect ~472.9 GInter/s)
stage bench timeout 1800 python bench.py

# 3. quick verify drive (forward coincident bitwise at N=4096)
stage verify_drive timeout 1200 python -u -c "
import jax, numpy as np
from mini_nbody_tpu import SimConfig, simulate, body_force, init
assert jax.default_backend() == 'tpu'
s = init.uniform_random(jax.random.key(0), 4096)
f_ref = np.asarray(body_force(s.pos, s.pos, s.mass, backend='jnp'))
for be in ('pallas', 'sym', 'sym_mxu'):
    f = np.asarray(body_force(s.pos, s.pos, s.mass, backend=be))
    print(be, float(np.abs(f - f_ref).max() / np.abs(f_ref).max()))
fm = np.asarray(body_force(s.pos, s.pos, s.mass, backend='sym_mxu', coincident='masked'))
fa = np.asarray(body_force(s.pos, s.pos, s.mass, backend='sym_mxu', coincident='auto'))
print('auto==masked bitwise:', bool((fa == fm).all()))
out = simulate(SimConfig(n=4096, steps=10), s)
print('simulate ok', np.asarray(out.pos).shape)"

# 4. w-variant probe incl. the new foldsoft candidate
stage probe_w timeout 3000 python benchmarks/probe_w_variants.py --reps 3

# 5. full TPU test suite (~25 min)
stage tpu_suite timeout 3500 env NBODY_TEST_TPU=1 python -m pytest tests/ -q

echo "ALL STAGES ATTEMPTED — logs in $OUT"
