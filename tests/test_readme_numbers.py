"""README perf numbers must be mechanically honest (VERDICT r3 item 7):
the bench block between BENCH markers is generated from
benches/latest.json by benches/render_readme.py; this test regenerates
it and fails when the committed README disagrees with the artifact."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_bench_block_matches_latest_json():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benches", "render_readme.py"),
         "--check"],
        capture_output=True, text=True, cwd=ROOT,
    )
    assert r.returncode == 0, (
        f"README bench block is stale:\n{r.stderr}\n"
        "regenerate with: python benches/render_readme.py"
    )


def test_readme_layout_block_not_stale():
    """Every stark_tpu/<pkg>/<file>.py the README layout block names must
    exist (the r3 verdict caught a deleted module still listed)."""
    import re

    text = open(os.path.join(ROOT, "README.md")).read()
    m = re.search(r"```\nstark_tpu/\n(.*?)```", text, re.S)
    assert m, "README layout block missing"
    block = m.group(0)
    pkg = None
    for line in block.splitlines():
        if not line.startswith("  "):      # tests/, docs/, bench.py, ...
            pkg = None
            continue
        pm = re.match(r"  (\w+)/ ", line)
        if pm:
            pkg = pm.group(1)
        elif re.match(r"  \w+\.py", line):  # top-level stark_tpu/ file
            pkg = ""
        if pkg is None:
            continue
        for fname in re.findall(r"(\w+)\.py", line):
            path = os.path.join(ROOT, "stark_tpu", pkg, fname + ".py")
            assert os.path.exists(path), (
                f"README layout names {pkg + '/' if pkg else ''}{fname}.py "
                "which no longer exists")
