"""bench.py budget-guard behavior (VERDICT r4 #1 — BENCH_r04 was rc=124
with zero lines; the guard is what makes that impossible now).

With an exhausted budget bench.py must still exit 0 and print explicit
JSON note lines instead of timing out silently; no TPU work happens (all
metrics are skipped before any device computation).
"""

import json
import os
import subprocess
import sys


def test_bench_budget_guard_skips_cleanly():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SHT_BENCH_BUDGET='0.001')
    p = subprocess.run([sys.executable, os.path.join(root, 'bench.py')],
                       capture_output=True, text=True, timeout=300, env=env)
    assert p.returncode == 0, p.stderr[-2000:]
    lines = [json.loads(l) for l in p.stdout.splitlines()
             if l.startswith('{')]
    assert lines, p.stdout
    notes = [l for l in lines if 'note' in l]
    assert len(notes) >= 3                     # every gated metric noted
    assert all('skipped' in l['note'] for l in notes)
    assert any('SHT_BENCH_BUDGET' in l['note'] for l in notes)
