#!/usr/bin/env bash
# Export a reproducible snapshot of the training environment.
#
# TPU-native counterpart of the reference's venv export tooling
# (reference: export_venv.sh — tars the whole venv). Tarring site-packages
# is brittle across machines; this captures everything needed to REBUILD
# and verify the environment instead, plus (optionally) the artifacts that
# actually carry state here: orbax checkpoints and the persistent XLA
# compilation cache.
#
# Usage:
#   bash scripts/export_env.sh [outdir] [--with-wheels] [--with-cache]
#                              [--checkpoints DIR]
#
# Produces <outdir>/env_export_<ts>/ with:
#   manifest.json      python/jax/device/platform info for verification
#   requirements.txt   exact package pins (pip freeze)
#   wheels/            offline-install wheel bundle   (--with-wheels; needs
#                      network OR a warm pip cache)
#   xla_cache.tar.gz   persistent compilation cache   (--with-cache)
#   checkpoints.tar.gz checkpoint dir                 (--checkpoints DIR)
set -euo pipefail

OUT="env_export"
if [ $# -gt 0 ] && [ "${1#--}" = "$1" ]; then  # first arg only if not a flag
  OUT="$1"
  shift
fi
WITH_WHEELS=0; WITH_CACHE=0; CKPT_DIR=""
while [ $# -gt 0 ]; do
  case "$1" in
    --with-wheels) WITH_WHEELS=1 ;;
    --with-cache) WITH_CACHE=1 ;;
    --checkpoints) shift; CKPT_DIR="$1" ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
  shift
done

TS=$(date +%Y%m%d_%H%M%S)
DEST="$OUT/env_export_$TS"
mkdir -p "$DEST"

echo "==> exporting environment snapshot to $DEST"
python -m pip freeze --all > "$DEST/requirements.txt" 2>/dev/null \
  || pip freeze --all > "$DEST/requirements.txt"

python - "$DEST/manifest.json" <<'PY'
import json, platform, subprocess, sys
info = {
    "python": sys.version,
    "platform": platform.platform(),
    "machine": platform.machine(),
}
try:
    import jax
    info["jax"] = jax.__version__
    info["jax_backend"] = jax.default_backend()
    info["devices"] = [str(d) for d in jax.devices()]
except Exception as e:  # backend may be unavailable on a bare host
    info["jax_error"] = f"{type(e).__name__}: {e}"
with open(sys.argv[1], "w") as f:
    json.dump(info, f, indent=2)
print(json.dumps(info, indent=2))
PY

if [ "$WITH_WHEELS" = 1 ]; then
  echo "==> bundling wheels (pip download; uses network or local pip cache)"
  mkdir -p "$DEST/wheels"
  python -m pip download -r "$DEST/requirements.txt" -d "$DEST/wheels" \
    || echo "WARN: wheel bundling incomplete (offline?); requirements.txt still valid"
fi

if [ "$WITH_CACHE" = 1 ]; then
  CACHE_DIR="${XAZ_XLA_CACHE:-$HOME/.cache/xiangqi_az_tpu/xla}"
  if [ -d "$CACHE_DIR" ]; then
    echo "==> packing XLA compilation cache ($CACHE_DIR)"
    tar -C "$(dirname "$CACHE_DIR")" -czf "$DEST/xla_cache.tar.gz" \
      "$(basename "$CACHE_DIR")"
  else
    echo "WARN: no compilation cache at $CACHE_DIR"
  fi
fi

if [ -n "$CKPT_DIR" ]; then
  echo "==> packing checkpoints ($CKPT_DIR)"
  tar -C "$(dirname "$CKPT_DIR")" -czf "$DEST/checkpoints.tar.gz" \
    "$(basename "$CKPT_DIR")"
fi

echo "==> done: $DEST"
ls -la "$DEST"
