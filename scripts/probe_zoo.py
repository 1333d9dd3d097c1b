"""Validate the AOT program zoo on the REAL serving executables.

Round 4 found `serialize_executable` produced no entry for the big fused
program on the axon relay and left the zoo opt-in
(``MARIE_PROGRAM_ZOO_ENABLE``).  probe_cc's AOT probe now measures
deserialize+load at 0.02 s vs 0.99 s for a cache-hit compile — this
script checks the real thing end to end:

  pass 1 (this process): run the engine with the zoo enabled on the
      psize=1 and psize=16 rungs -> entries must appear in program_zoo/
  pass 2 (subprocess):   fresh process, zoo enabled; times the first
      extract of each rung and diffs outputs against pass 1

    python scripts/probe_zoo.py
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DRIVE = r'''
import json, os, sys, time
sys.path.insert(0, %(repo)r)
os.environ["MARIE_PROGRAM_ZOO_ENABLE"] = "1"
from marie_tpu.utils.jax_cache import enable_persistent_cache
enable_persistent_cache()
from bench import make_pages
from marie_tpu.ocr.util import get_known_ocr_engines

t0 = time.time()
engine = get_known_ocr_engines(engine="default")["default"]
boot_s = time.time() - t0
pages = make_pages(16, seed=99)
t0 = time.time(); r1 = engine.extract(pages[:1]); t_single = time.time() - t0
t0 = time.time(); r16 = engine.extract(pages); t_batch = time.time() - t0
words = [[w["text"] for w in r["words"]] for r in r16]
print(json.dumps({
    "boot_s": round(boot_s, 2),
    "first_single_s": round(t_single, 2),
    "first_batch16_s": round(t_batch, 2),
    "words_hash": __import__("hashlib").md5(
        json.dumps(words).encode()).hexdigest(),
    "n_words": sum(len(w) for w in words),
}))
'''


def run_pass(repo):
    out = subprocess.run(
        [sys.executable, "-c", DRIVE % {"repo": repo}],
        capture_output=True, text=True, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        return json.loads(line)
    except Exception:
        print("pass failed:", out.stdout[-2000:], out.stderr[-2000:])
        raise


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zoo = os.path.join(repo, "program_zoo")
    before = {f for f in os.listdir(zoo) if f.endswith(".jexec")}
    t0 = time.time()
    a = run_pass(repo)
    print(f"pass1 (may compile+save): {a}  [{time.time()-t0:.0f}s]")
    after = {f for f in os.listdir(zoo) if f.endswith(".jexec")}
    new = sorted(after - before)
    print(f"new zoo entries: {len(new)}")
    for f in new:
        print("  ", f, os.path.getsize(os.path.join(zoo, f)) // 1024, "KB")
    t0 = time.time()
    b = run_pass(repo)
    print(f"pass2 (fresh process, zoo warm): {b}  [{time.time()-t0:.0f}s]")
    match = a["words_hash"] == b["words_hash"] and a["n_words"] == b["n_words"]
    print(f"output match across processes: {match}")
    return 0 if match else 1


if __name__ == "__main__":
    raise SystemExit(main())
