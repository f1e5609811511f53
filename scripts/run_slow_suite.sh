#!/bin/bash
# Per-round slow-suite gate (VERDICT r4 Weak #6): run the slow-marked
# integration layer module by module (one XLA-compiler crash must not
# lose the whole record), append per-module summary lines, and write a
# machine-checkable summary file. CPU-only (tests/conftest.py forces
# JAX_PLATFORMS=cpu + an 8-device virtual mesh).
set -u
OUT="${SLOWSUITE_OUT:-/root/repo/SLOWSUITE_r05.md}"
LOG="${SLOWSUITE_LOG:-/tmp/slowsuite_r05_modules.log}"
cd /root/repo
echo "# Slow-suite record (round 5)" > "$OUT"
echo "" >> "$OUT"
echo "Command: per-module \`pytest -m slow -q tests/<mod>\` (1-core box)." >> "$OUT"
echo "Date: $(date -u +%Y-%m-%dT%H:%M:%SZ)" >> "$OUT"
echo "" >> "$OUT"
echo "| module | result | wall |" >> "$OUT"
echo "|---|---|---|" >> "$OUT"
total_fail=0
for mod in tests/test_*.py; do
  # only run modules that actually collect slow tests
  n=$(python -m pytest -m slow --collect-only -q "$mod" 2>/dev/null | grep -c "::") || true
  if [ "$n" -eq 0 ]; then continue; fi
  t0=$(date +%s)
  timeout 2400 nice -n 19 python -m pytest -m slow -q "$mod" >> "$LOG" 2>&1
  rc=$?
  t1=$(date +%s)
  line=$(tail -40 "$LOG" | grep -E "passed|failed|error" | tail -1)
  if [ $rc -ne 0 ]; then total_fail=$((total_fail+1)); line="rc=$rc $line"; fi
  echo "| $mod | ${line:-rc=$rc (no summary)} | $((t1-t0))s |" >> "$OUT"
  echo "[slowsuite] $mod rc=$rc ${line:-} ($((t1-t0))s)"
done
echo "" >> "$OUT"
if [ $total_fail -eq 0 ]; then
  echo "**All slow modules green.**" >> "$OUT"
else
  echo "**$total_fail module(s) failed — see $LOG.**" >> "$OUT"
fi
echo "[slowsuite] done, failures=$total_fail"
