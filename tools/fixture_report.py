#!/usr/bin/env python
"""Run the kernel over all reference golden fixtures and report pass rates.

Usage: python tools/fixture_report.py [--fail-detail NAME] [--quick]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smartreader_spark.kernel.metadata import try_parse_datetime
from smartreader_spark.kernel.reader import extract_html
from smartreader_spark.kernel.serializer import expected_html_to_spans

PAGES = "/root/reference/src/SmartReaderTests/test-pages"


def ttr_to_sec(s: str | None) -> int | None:
    if not s:
        return None
    parts = [int(x) for x in s.split(":")]
    while len(parts) < 3:
        parts.insert(0, 0)
    h, m, sec = parts
    return h * 3600 + m * 60 + sec


def check_fixture(name: str) -> dict:
    d = os.path.join(PAGES, name)
    src = open(os.path.join(d, "source.html"), encoding="utf-8", errors="replace").read()
    exp_html = open(os.path.join(d, "expected.html"), encoding="utf-8", errors="replace").read()
    meta = json.load(open(os.path.join(d, "expected-metadata.json"), encoding="utf-8-sig"))

    t0 = time.time()
    try:
        res = extract_html(src)
    except Exception as exc:
        return {"name": name, "crash": repr(exc)[:200], "secs": time.time() - t0}
    secs = time.time() - t0

    out = {"name": name, "crash": None, "secs": secs, "fields": {}, "spans": None}

    def field(key, got, want, norm=lambda x: x):
        g = norm(got) if got is not None else None
        w = norm(want) if want is not None else None
        # metadata JSON omits empty-string fields; treat None==""
        if (g or None) == (w or None):
            out["fields"][key] = True
        else:
            out["fields"][key] = (repr(g)[:80], repr(w)[:80])

    field("title", res["title"], meta.get("title"))
    field("byline", res["byline"], meta.get("byline"))
    field("dir", res["dir"], meta.get("dir"))
    field("language", res["language"], meta.get("language"))
    field("author", res["author"], meta.get("author"))
    field("excerpt", res["excerpt"], meta.get("excerpt"))
    field("site_name", res["site_name"], meta.get("siteName"))
    field("featured_image", res["featured_image"], meta.get("featuredImage"))
    field("readerable", res["is_readable"], meta.get("readerable", False))
    field("ttr", res["reading_time_sec"] or None, ttr_to_sec(meta.get("timeToRead")))
    exp_date = try_parse_datetime(meta.get("publicationDate"))
    field("pub_date", res["published_at"], exp_date)
    # PagesTests.cs:85 asserts AlternativeLanguageUris per fixture
    field("alt_lang_uris", res["alternative_language_uris"] or None,
          meta.get("alternativeLanguageUris") or None)

    want = expected_html_to_spans(exp_html)
    got = res["spans"]
    key = lambda s: (s["kind"], s["text"], s["media_ref"])
    if len(got) == len(want) and all(key(a) == key(b) for a, b in zip(got, want)):
        out["spans"] = True
    else:
        first_diff = None
        for i in range(min(len(got), len(want))):
            if key(got[i]) != key(want[i]):
                first_diff = i
                break
        out["spans"] = {
            "got_n": len(got), "want_n": len(want), "first_diff": first_diff,
        }
    return out


def main() -> None:
    names = sorted(os.listdir(PAGES))
    if "--quick" in sys.argv:
        names = names[:30]
    detail = None
    if "--fail-detail" in sys.argv:
        detail = sys.argv[sys.argv.index("--fail-detail") + 1]
        names = [detail]

    t0 = time.time()
    results = [check_fixture(n) for n in names]
    wall = time.time() - t0

    crashes = [r for r in results if r["crash"]]
    span_pass = [r for r in results if r.get("spans") is True]
    FIELDS = ["title", "byline", "dir", "language", "author", "excerpt",
              "site_name", "featured_image", "readerable", "ttr", "pub_date",
              "alt_lang_uris"]
    print(f"fixtures: {len(results)}  wall: {wall:.1f}s  crashes: {len(crashes)}")
    print(f"SPANS exact: {len(span_pass)}/{len(results)}")
    for f in FIELDS:
        ok = sum(1 for r in results if not r["crash"] and r["fields"].get(f) is True)
        print(f"  {f:15s}: {ok}/{len(results)}")
    full = [r for r in results if not r["crash"] and r["spans"] is True
            and all(v is True for v in r["fields"].values())]
    print(f"FULL pass: {len(full)}/{len(results)}")

    if crashes:
        print("\ncrashes:")
        for r in crashes[:10]:
            print(" ", r["name"], r["crash"])

    fails = [r for r in results if not r["crash"] and r["spans"] is not True]
    if fails and detail is None:
        print("\nspan fails:")
        for r in fails[:40]:
            print(f"  {r['name']:45s} {r['spans']}")

    if detail:
        r = results[0]
        print(json.dumps(r, indent=2, default=str))

    slow = sorted(results, key=lambda r: -r["secs"])[:8]
    print("\nslowest:")
    for r in slow:
        print(f"  {r['name']:45s} {r['secs']:.2f}s")


if __name__ == "__main__":
    main()
