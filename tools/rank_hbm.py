"""Rank HBM consumers from an optimized-HLO dump (BENCH_HLO_OUT).

Post-fusion, every top-level HLO instruction's operands and outputs live in
HBM — fused internals don't.  So per-op HBM traffic is well approximated by
`output_bytes + sum(operand_bytes)`, and ranking those sums over the
while-loop (scan) body computation gives the top traffic consumers of one
inner train step — the "profiler pass" of VERDICT round-2 item 7, done
through the tunnel without the profiler UI (the axon runtime exposes no
trace transport).

Usage:
    BENCH_ANALYZE=1 BENCH_HLO_OUT=/tmp/loop.hlo python bench.py
    python tools/rank_hbm.py /tmp/loop.hlo [--top 30]

Known over-count: XLA prefetches weights/activations into VMEM (S(1))
via async-start/done slice pairs; the consuming fusion then lists the
VMEM copy as an operand.  Both legs are counted here, so weight traffic
appears twice (once under <async-start>/<async-done>, once in the
consumer's reads).  Ranks are still faithful within each group; treat
the async rows as the same bytes as their consumers', not additional.
"""

from __future__ import annotations

import argparse
import collections
import re
import sys

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16, "token": 0, "opaque": 0,
}

SHAPE_RE = re.compile(r"\b(pred|[us]\d+|bf16|f16|f32|f64|c64|c128)\[([\d,]*)\]")


def shape_bytes(text: str) -> int:
    """Total bytes of every array shape mentioned in `text` (handles tuples)."""
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES.get(dt, 4)
    return total


# %name = SHAPE opcode(operands...), attrs..., metadata={op_name="..."}
INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\(?.+?\)?)\s+([\w\-]+)\(")
OPNAME_RE = re.compile(r'op_name="([^"]+)"')


def parse(path: str):
    """Yield (computation_name, instr_name, out_bytes, opcode, op_name, line)."""
    comp = None
    shapes: dict[str, int] = {}
    rows = []
    with open(path) as f:
        for line in f:
            if not line.startswith((" ", "\t")) and "{" in line and "=" not in line.split("{")[0]:
                # computation header: `%name (params) -> shape {`
                m = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*\(", line)
                comp = m.group(1) if m else comp
                continue
            m = INSTR_RE.match(line)
            if not m:
                continue
            name, out_shape, opcode = m.groups()
            ob = shape_bytes(out_shape)
            shapes[name] = ob
            mo = OPNAME_RE.search(line)
            rows.append((comp, name, ob, opcode, mo.group(1) if mo else "", line))
    return rows, shapes


def label_of(op_name: str, opcode: str) -> str:
    """Compress a jax op_name path into a readable attribution label."""
    if not op_name:
        return f"<{opcode}>"
    # strip jit wrapper + transpose markers, keep the meaningful tail
    parts = [p for p in op_name.split("/") if p and not p.startswith("jit(")]
    tail = "/".join(parts[-3:]) if parts else op_name
    return tail[:90]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("hlo")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--body-only", action="store_true", default=True,
                    help="restrict to while-loop body computations (the scan step)")
    args = ap.parse_args()

    rows, shapes = parse(args.hlo)
    # operand reads: re-scan lines for %ref occurrences that match known names
    ref_re = re.compile(r"%([\w.\-]+)")
    per_label = collections.Counter()
    per_instr = []
    body_comps = {c for c, *_ in rows if c and ("body" in c or "while" in c)}
    for comp, name, ob, opcode, op_name, line in rows:
        if comp is None or comp.startswith("fused_computation"):
            continue
        if args.body_only and body_comps and comp not in body_comps:
            continue
        if opcode in ("parameter", "constant", "get-tuple-element", "tuple",
                      "bitcast", "while", "conditional", "call",
                      "copy-start", "copy-done"):
            # control flow / async markers alias their operands in place
            continue
        reads = 0
        args_part = line.split("(", 1)[1] if "(" in line else ""
        args_part = args_part.split("metadata=")[0].split("calls=")[0]
        operand_sizes = [
            shapes[r] for r in ref_re.findall(args_part)
            if r in shapes and r != name
        ]
        reads = sum(operand_sizes)
        # opcode-aware corrections: slicing ops read only what they emit,
        # not their whole source operand; in-place updates touch 2x the
        # update region, not the aliased buffer
        if opcode in ("slice", "dynamic-slice", "gather") or "slice-start" in name:
            reads = ob
        elif opcode == "dynamic-update-slice" and operand_sizes:
            upd = min(operand_sizes)
            reads, ob = upd, upd
        total = ob + reads
        lab = label_of(op_name, opcode)
        per_label[lab] += total
        per_instr.append((total, ob, reads, opcode, lab, name))

    grand = sum(per_label.values())
    print(f"total attributed bytes (writes+reads, body computations): "
          f"{grand/1e9:.1f} GB")
    print("\n== top instructions ==")
    per_instr.sort(reverse=True)
    for total, ob, reads, opcode, lab, name in per_instr[: args.top]:
        print(f"{total/1e9:7.2f} GB  (out {ob/1e9:6.2f} / in {reads/1e9:6.2f})  "
              f"{opcode:<12} {lab}")
    print("\n== top labels (grouped) ==")
    for lab, tot in per_label.most_common(args.top):
        print(f"{tot/1e9:7.2f} GB  {100*tot/grand:4.1f}%  {lab}")


if __name__ == "__main__":
    main()
