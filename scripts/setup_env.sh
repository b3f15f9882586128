#!/usr/bin/env bash
# Environment bootstrap / health check for xiangqi-alphazero-tpu.
#
# The reference project ships venv tar/migration scripts for moving its
# CPU/GPU training environment between machines (reference: setup_venv.sh,
# migrate_venv.sh). The TPU-native equivalent is much smaller: the runtime
# is jax[tpu] + flax + optax + orbax, and state moves via orbax checkpoints
# (cloud-storage friendly) rather than venv tarballs. This script verifies
# a host is ready and prints what is missing.
set -u

ok=1
say() { printf '%-34s %s\n' "$1" "$2"; }

check_py() {
  if python - "$1" <<'PY' 2>/dev/null
import importlib, sys
importlib.import_module(sys.argv[1])
PY
  then say "python: $1" "OK"; else say "python: $1" "MISSING"; ok=0; fi
}

for m in jax flax optax orbax.checkpoint numpy; do check_py "$m"; done
check_py torch && true   # optional: reference-checkpoint import/export

if command -v g++ >/dev/null; then
  say "g++ (native host engine)" "OK ($(g++ -dumpversion))"
else
  say "g++ (native host engine)" "missing -> pure-Python rules fallback"
fi

python - <<'PY'
import jax
ds = jax.devices()
print(f"{'jax backend':<34} {ds[0].platform} x{len(ds)} ({ds[0].device_kind})")
PY

if [ "$ok" = 1 ]; then
  echo "environment ready. quick smoke: python -m pytest tests/ -q -x"
else
  echo "missing core deps: pip install -U 'jax[tpu]' flax optax orbax-checkpoint"
  exit 1
fi
