#!/usr/bin/env python
"""Show span-level diff for one fixture: python tools/span_diff.py NAME [n]"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smartreader_spark.kernel.reader import extract_html
from smartreader_spark.kernel.serializer import expected_html_to_spans

PAGES = "/root/reference/src/SmartReaderTests/test-pages"

name = sys.argv[1]
ctx = int(sys.argv[2]) if len(sys.argv) > 2 else 4
d = os.path.join(PAGES, name)
src = open(os.path.join(d, "source.html"), encoding="utf-8", errors="replace").read()
exp = open(os.path.join(d, "expected.html"), encoding="utf-8", errors="replace").read()
got = extract_html(src)["spans"]
want = expected_html_to_spans(exp)

key = lambda s: (s["kind"], s["text"], s["media_ref"])
import difflib

sm = difflib.SequenceMatcher(a=[key(s) for s in got], b=[key(s) for s in want])
print(f"got={len(got)} want={len(want)} ratio={sm.ratio():.3f}")
for tag, i1, i2, j1, j2 in sm.get_opcodes():
    if tag == "equal":
        continue
    print(f"--- {tag} got[{i1}:{i2}] want[{j1}:{j2}]")
    for s in got[i1:i2][:ctx]:
        print(f"  G {s['kind']:8s} {repr(s['text'][:110])} {s['media_ref'] and s['media_ref'][:60]}")
    for s in want[j1:j2][:ctx]:
        print(f"  W {s['kind']:8s} {repr(s['text'][:110])} {s['media_ref'] and s['media_ref'][:60]}")
