#!/usr/bin/env bash
# Full local gate: unit tests → DuckDB-oracle correctness → plan audit → bench.
# Usage: scripts/ci.sh [--fast]   (--fast skips bench)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== repo hygiene ==="
# no git-ignored scratch worktrees inside the repo root (VERDICT r8 #4:
# a stale .r4wt/ distorted the LoC diagnostic and risked stale copies)
if [[ -n "$(git worktree list --porcelain | grep -c '^worktree' || true)" ]] \
   && [[ "$(git worktree list --porcelain | grep -c '^worktree')" -gt 1 ]]; then
  echo "FAIL: extra git worktrees registered inside the repo:" >&2
  git worktree list >&2
  exit 1
fi
echo "no scratch worktrees"

echo "=== driver-window tripwire ==="
python scripts/check_window.py

echo "=== pytest ==="
python -m pytest tests/ -q

echo "=== oracle gate (sf0.01) ==="
python scripts/check_oracle.py

echo "=== plan audit ==="
python scripts/explain_audit.py

if [[ "${1:-}" != "--fast" ]]; then
  echo "=== bench (sf0.1) ==="
  python bench.py
fi
echo "=== all gates green ==="
