#!/usr/bin/env bash
# Full local gate: unit tests → DuckDB-oracle correctness → plan audit → bench.
# Usage: scripts/ci.sh [--fast]   (--fast skips bench)
set -euo pipefail
cd "$(dirname "$0")/.."

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
