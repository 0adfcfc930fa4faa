"""Render the RESULTS.md cross-family tables from the canonical
benchmark file (results/bench_table.jsonl) — and verify they match.

The canonical file holds exactly one row per (code, decoder, max_iters,
batch) — regenerate with tools/bench_canonical.sh (older measurements
live in results/bench_table_history.jsonl).  RESULTS.md contains the
rendered tables between marker comments; this script keeps them
mechanical:

    python tools/render_bench_table.py --update   # rewrite RESULTS.md
    python tools/render_bench_table.py --check    # exit 1 on mismatch

(VERDICT r4 #5: one canonical row per config, RESULTS numbers trace to
rows, consistency enforced by a tools script.)
"""

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
TABLE = ROOT / "results" / "bench_table.jsonl"
RESULTS = ROOT / "RESULTS.md"
BEGIN = "<!-- BEGIN GENERATED: cross-family (tools/render_bench_table.py) -->"
END = "<!-- END GENERATED -->"

LABELS = {
    "dvbs2:R1_2": "DVB-S2 R1_2 n=64800",
    "dvbs2:R1_2short": "DVB-S2 R1_2short n=16200",
    "dvbs2:R9_10": "DVB-S2 R9_10 (k=58320)",
    "ccsds:R1_2:4096": "AR4JA r=1/2 k=4096",
    "c2": "CCSDS C2 (8176, 7156)",
    "5g:BG1:384": "5G BG1 Z=384 n=26112",
    "5g:BG2:384": "5G BG2 Z=384 (r=0.19)",
}


def load():
    rows = {}
    with open(TABLE) as f:
        for line in f:
            r = json.loads(line)
            key = (r["code"], r["decoder"], r["max_iters"], r["batch"])
            if key in rows:
                raise SystemExit(
                    f"duplicate canonical row {key}; regenerate with "
                    "tools/bench_canonical.sh"
                )
            rows[key] = r
    return rows


def get(rows, code, dec, iters=30, batch=512):
    r = rows.get((code, dec, iters, batch))
    if r is None:
        raise SystemExit(f"missing canonical row ({code}, {dec}, {iters}, {batch})")
    return r


def res_label(r):
    res = r.get("resident")
    if res == "compressed":
        return "compressed resident"
    if res == "aliased":
        return "aliased resident"
    return "resident" if res else "streaming"


def render(rows):
    out = [BEGIN, ""]
    out.append(
        "Sustained Mbit/s (chained protocol, serialized idle-chip run — "
        "`tools/bench_canonical.sh`), max 30 iters, B=512, 1.0 dB "
        "(C2 at 4.0 dB, R9_10 at 3.5 dB — their waterfall operating "
        "points)."
    )
    out.append("")
    out.append("**Layered bf16 min-sum per family:**")
    out.append("")
    out.append("| code | decoder (path) | Mbit/s sust | avg iters | compile_s* |")
    out.append("|---|---|---|---|---|")
    for code in [
        "dvbs2:R1_2",
        "dvbs2:R1_2short",
        "dvbs2:R9_10",
        "ccsds:R1_2:4096",
        "c2",
        "5g:BG1:384",
        "5g:BG2:384",
    ]:
        r = get(rows, code, "HLMinsumbf16")
        out.append(
            f"| {LABELS[code]} | HLMinsumbf16 ({res_label(r)}) | "
            f"**{r['mbps_sustained']}** | {r['avg_iterations']} | "
            f"{r['compile_s']} |"
        )
    r = get(rows, "dvbs2:R1_2", "HLMinsumbf16", iters=18, batch=1024)
    out.append(
        f"| DVB-S2 R1_2, measured equal-quality budget (18 iters, B=1024) "
        f"| HLMinsumbf16 ({res_label(r)}) | **{r['mbps_sustained']}** | "
        f"{r['avg_iterations']} | {r['compile_s']} |"
    )
    r = rows.get(("5g:BG1:384", "HLMinsumbf16", 15, 1024))
    if r is not None:
        out.append(
            f"| 5G BG1, measured equal-quality budget (15 iters, B=1024) "
            f"| HLMinsumbf16 ({res_label(r)}) | **{r['mbps_sustained']}** | "
            f"{r['avg_iterations']} | {r['compile_s']} |"
        )
    out.append("")
    out.append("**Flooding and other-rule rows:**")
    out.append("")
    out.append("| code | decoder (path) | Mbit/s sust | avg iters |")
    out.append("|---|---|---|---|")
    for code, dec in [
        ("dvbs2:R1_2", "Minsumbf16"),
        ("dvbs2:R1_2", "HLMinsumf32"),
        ("dvbs2:R1_2", "HLMinstarapproxi8"),
        ("dvbs2:R1_2", "HLAminstari8"),
        ("dvbs2:R1_2", "Minstarapproxi8"),
        ("ccsds:R1_2:4096", "Minsumbf16"),
        ("c2", "Minsumbf16"),
        ("5g:BG1:384", "Minsumbf16"),
        ("5g:BG1:384", "Minstarapproxi8"),
        ("5g:BG1:384", "HLMinstarapproxi8"),
    ]:
        r = get(rows, code, dec)
        out.append(
            f"| {LABELS[code]} | {dec} ({res_label(r)}) | "
            f"**{r['mbps_sustained']}** | {r['avg_iterations']} |"
        )
    out.append("")
    out.append(
        "(*compile_s is the wall time of the first compile in the "
        "canonical run; the remote compile service caches programs "
        "server-side, so repeat compiles of an unchanged program are "
        "much faster — genuinely cold times for new programs are in the "
        "compile-time table below.)"
    )
    out.append("")
    out.append(END)
    return "\n".join(out)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "--check"
    rows = load()
    block = render(rows)
    text = RESULTS.read_text()
    if BEGIN not in text or END not in text:
        raise SystemExit("RESULTS.md markers not found")
    pre, rest = text.split(BEGIN, 1)
    _, post = rest.split(END, 1)
    new = pre + block + post
    if mode == "--update":
        RESULTS.write_text(new)
        print("RESULTS.md cross-family section updated")
    else:
        if new != text:
            print("MISMATCH: RESULTS.md tables do not match "
                  "results/bench_table.jsonl; run --update")
            sys.exit(1)
        print("ok: RESULTS.md tables match the canonical rows")


if __name__ == "__main__":
    main()
