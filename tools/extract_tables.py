"""Extract standards-defined constant tables into JSON data files.

The DVB-S2 accumulator-address tables (ETSI EN 302 307-1 Annex B), the 5G NR
base-graph V_ij tables (3GPP TS 38.212 Tables 5.3.2-2/5.3.2-3), and the
CCSDS AR4JA THETA/PHI and C2 circulant tables (CCSDS 131.0-B-5 Tables
7-3/7-4/7-1) are pure numeric standards data. This tool parses them out of
the reference implementation's source and re-serializes them as JSON under
``ldpc_toolbox_tpu/codes/data/`` — the framework loads the JSON, never the
reference source.

Run from the repo root:  python tools/extract_tables.py
"""

import json
import pathlib
import re

REF = pathlib.Path("/root/reference/src/codes")
OUT = pathlib.Path(__file__).resolve().parent.parent / "ldpc_toolbox_tpu/codes/data"


def _match_bracket(text: str, start: int) -> int:
    """Index just past the bracket matching text[start] ('[' or '(')."""
    open_ch = text[start]
    close_ch = {"[": "]", "(": ")"}[open_ch]
    depth = 0
    for i in range(start, len(text)):
        if text[i] == open_ch:
            depth += 1
        elif text[i] == close_ch:
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError("unbalanced brackets")


def extract_dvbs2():
    src = (REF / "dvbs2.rs").read_text()
    # the addresses() function: per-code nested slice literals
    fn_start = src.index("const fn addresses")
    body_start = src.index("match self", fn_start)
    codes = {}
    for m in re.finditer(r"Code::(\w+) => &\[", src[body_start:]):
        name = m.group(1)
        if name in codes:
            continue
        open_idx = body_start + m.end() - 1
        end = _match_bracket(src, open_idx)
        block = src[open_idx:end]
        rows = []
        i = 1  # skip the outer '['
        while True:
            j = block.find("&[", i)
            if j == -1:
                break
            k = _match_bracket(block, j + 1)
            rows.append([int(x) for x in re.findall(r"\d+", block[j + 1 : k])])
            i = k
        codes[name] = rows
    # q values
    q_start = src.index("const fn q")
    q_end = src.index("}", src.index("match self", q_start) + 200)
    qs = dict(
        (m.group(1), int(m.group(2)))
        for m in re.finditer(r"Code::(\w+) => (\d+)", src[q_start : q_start + 2000])
    )
    assert len(codes) == 21 and len(qs) == 21, (len(codes), len(qs))
    out = {"q": qs, "addresses": codes}
    (OUT / "dvbs2_tables.json").write_text(json.dumps(out))
    print("dvbs2:", len(codes), "codes;",
          {k: len(v) for k, v in list(codes.items())[:3]}, "...")


def extract_nr5g():
    src = (REF / "nr5g.rs").read_text()
    graphs = {}
    for fn, nrows in (("base_graph_1", 46), ("base_graph_2", 42)):
        fn_start = src.index(f"fn {fn}()")
        open_idx = src.index("[", src.index("{", fn_start))
        end = _match_bracket(src, open_idx)
        block = src[open_idx:end]
        rows = []
        i = 0
        while True:
            j = block.find("vec![", i)
            if j == -1:
                break
            k = _match_bracket(block, j + 4)
            vec_block = block[j:k]
            row = []
            for rm in re.finditer(r"row!\(([^)]*)\)", vec_block):
                nums = [int(x) for x in rm.group(1).split()]
                assert len(nums) == 9, nums
                row.append({"col": nums[0], "vij": nums[1:]})
            rows.append(row)
            i = k
        assert len(rows) == nrows, (fn, len(rows))
        graphs[fn[-1]] = rows
    (OUT / "nr5g_tables.json").write_text(json.dumps(graphs))
    print("nr5g: BG1 rows", len(graphs["1"]), "edges",
          sum(len(r) for r in graphs["1"]),
          "BG2 rows", len(graphs["2"]), "edges",
          sum(len(r) for r in graphs["2"]))


def extract_ccsds():
    src = (REF / "ccsds.rs").read_text()
    # THETA_K
    m = re.search(r"static THETA_K[^=]*= \[([^\]]*)\]", src)
    theta = [int(x) for x in re.findall(r"\d+", m.group(1))]
    assert len(theta) == 26
    # PHI_K: [[[usize;7];26];4]
    start = src.index("static PHI_K")
    open_idx = src.index("[", start + 30)
    end = _match_bracket(src, open_idx)
    nums = [int(x) for x in re.findall(r"\d+", re.sub(r"//[^\n]*", "", src[open_idx:end]))]
    assert len(nums) == 4 * 26 * 7, len(nums)
    phi = [
        [nums[(j * 26 + k) * 7 : (j * 26 + k) * 7 + 7] for k in range(26)]
        for j in range(4)
    ]
    # C2 circulants: [[ [a,b]; 16]; 2]
    start = src.index("static C2_CIRCULANTS")
    open_idx = src.index("[", src.index("=", start))
    end = _match_bracket(src, open_idx)
    cnums = [int(x) for x in re.findall(r"\d+", src[open_idx:end])]
    assert len(cnums) == 2 * 16 * 2, len(cnums)
    c2 = [
        [cnums[(r * 16 + c) * 2 : (r * 16 + c) * 2 + 2] for c in range(16)]
        for r in range(2)
    ]
    (OUT / "ccsds_tables.json").write_text(
        json.dumps({"theta_k": theta, "phi_k": phi, "c2_circulants": c2})
    )
    print("ccsds: theta", len(theta), "phi", len(phi), "x", len(phi[0]),
          "c2", len(c2), "x", len(c2[0]))


if __name__ == "__main__":
    OUT.mkdir(parents=True, exist_ok=True)
    extract_dvbs2()
    extract_nr5g()
    extract_ccsds()
