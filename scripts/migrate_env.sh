#!/usr/bin/env bash
# Rebuild the training environment from an export_env.sh snapshot.
#
# TPU-native counterpart of the reference's migrate_venv.sh (which untars
# a venv and rewrites its paths). Here the environment is REBUILT from the
# pinned requirements (optionally fully offline from the bundled wheels),
# then verified with the same health check a fresh host runs, and the
# state artifacts (XLA cache, checkpoints) are restored.
#
# Usage:
#   bash scripts/migrate_env.sh <export_dir> [--venv PATH] [--offline]
#                               [--restore-cache] [--restore-checkpoints DIR]
#                               [--dry-run]
set -euo pipefail

SRC="${1:?usage: migrate_env.sh <export_dir> [options]}"
shift
VENV=""; OFFLINE=0; RESTORE_CACHE=0; CKPT_TO=""; DRY=0
while [ $# -gt 0 ]; do
  case "$1" in
    --venv) shift; VENV="$1" ;;
    --offline) OFFLINE=1 ;;
    --restore-cache) RESTORE_CACHE=1 ;;
    --restore-checkpoints) shift; CKPT_TO="$1" ;;
    --dry-run) DRY=1 ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
  shift
done

[ -f "$SRC/requirements.txt" ] || { echo "not an export dir: $SRC" >&2; exit 1; }
run() { if [ "$DRY" = 1 ]; then echo "DRY: $*"; else "$@"; fi; }

echo "==> snapshot manifest:"
cat "$SRC/manifest.json" 2>/dev/null || true

if [ -n "$VENV" ]; then
  echo "==> creating venv at $VENV"
  run python -m venv "$VENV"
  PIP="$VENV/bin/pip"; PY="$VENV/bin/python"
else
  PIP="python -m pip"; PY="python"
fi

if [ "$OFFLINE" = 1 ]; then
  [ -d "$SRC/wheels" ] || { echo "no wheels/ bundle for --offline" >&2; exit 1; }
  run $PIP install --no-index --find-links "$SRC/wheels" \
    -r "$SRC/requirements.txt"
else
  run $PIP install -r "$SRC/requirements.txt"
fi

if [ "$RESTORE_CACHE" = 1 ] && [ -f "$SRC/xla_cache.tar.gz" ]; then
  CACHE_DIR="${XAZ_XLA_CACHE:-$HOME/.cache/xiangqi_az_tpu/xla}"
  echo "==> restoring XLA compilation cache to $CACHE_DIR"
  run mkdir -p "$(dirname "$CACHE_DIR")"
  run tar -C "$(dirname "$CACHE_DIR")" -xzf "$SRC/xla_cache.tar.gz"
fi

if [ -n "$CKPT_TO" ] && [ -f "$SRC/checkpoints.tar.gz" ]; then
  echo "==> restoring checkpoints into $CKPT_TO"
  run mkdir -p "$CKPT_TO"
  run tar -C "$CKPT_TO" -xzf "$SRC/checkpoints.tar.gz"
fi

echo "==> verifying host"
if [ "$DRY" = 1 ]; then
  echo "DRY: bash scripts/setup_env.sh"
else
  bash "$(dirname "$0")/setup_env.sh" || true
  $PY - <<'PY'
import jax
print("jax", jax.__version__, "backend:", jax.default_backend(),
      "devices:", jax.devices())
PY
fi
echo "==> migration complete"
