#!/usr/bin/env python3
"""Bisect the Mosaic relayout failure by knocking out kernel sections.

Creates textual variants of dp_spliced_pallas.py in /tmp, imports each
under a unique module name, and tries a tiny on-chip run.
"""
import importlib.util
import pathlib
import sys
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

SRC = pathlib.Path("/root/repo/spaln_tpu/ops/dp_spliced_pallas.py").read_text()

VARIANTS = {
    "orig": [],
    "no_ipen_chain": [(
        "                for b_, v_ in ipen_key:\n"
        "                    pen = jnp.where(ilen >= b_, v_, pen)",
        "                pen = pen + 0 * ilen")],
    "no_close": [(
        "            for k in range(nstate):\n"
        "                cur = state_vals[k]",
        "            for k in range(0):\n"
        "                cur = state_vals[k]")],
    "no_push": [(
        "            don_ok = isdon & internal_m & active & (n < Nb)\n"
        "            for k in range(nstate):",
        "            don_ok = isdon & internal_m & active & (n < Nb)\n"
        "            for k in range(0):")],
    "no_emis": [(
        "            lane_sel = elanes == t2",
        "            lane_sel = elanes == t2 + h_out[0, 0] * 0")],
    "static_fills": [(
        "            fv = jnp.sum(jnp.where(el3 == t2, fl, 0), axis=2,\n"
        "                         keepdims=True)          # (3, GRP, 1)",
        "            fv = jnp.full((3, GRP, 1), NEV) + t2 * 0")],
    "static_roll": [(
        "            w = roll(blk, -r, 2)[:, :, :L]       # (SOP, GRP, L)",
        "            w = blk[:, :, :L] + r * 0            # (SOP, GRP, L)")],
    "no_edge": [(
        "            edge = first & (n != 1)",
        "            edge = first & (n != 1) & False")],
    "no_recur": [(
        "            h_val = diag_h + score",
        "            h_val = h1 + score + diag_h[0, 0] * 0")],
    "unsplat": [(
        "        negv = jnp.full((GRP, L), NEV)\n"
        "        zero = jnp.zeros((GRP, L), jnp.int32)\n"
        "        enegv = jnp.full((GRP, CHUNK), NEV)      # emission accumulators",
        "        negv = jnp.full((GRP, L), NEV) + dl * 0\n"
        "        zero = dl * 0\n"
        "        enegv = jnp.full((GRP, CHUNK), NEV) + dl * 0")],
    "no_psp": [(
        "            psp = jnp.where(e_open, jnp.where(prev_psp != 0, 1, 0),\n"
        "                            prev_psp & 1)",
        "            psp = prev_psp")],
}
combos = ["no_ipen_chain", "no_close", "no_push", "no_emis",
          "static_fills", "static_roll"]
VARIANTS["all_off"] = sum((VARIANTS[c] for c in combos), [])
VARIANTS["all_off_noedge"] = VARIANTS["all_off"] + VARIANTS["no_edge"]



def _cut_body(src, keep_recur=False, keep_close=False, keep_push=False):
    lines = src.split("\n")
    i0 = next(i for i, l in enumerate(lines) if "---- recurrence" in l)
    i_close = next(i for i, l in enumerate(lines) if "---- acceptor close" in l)
    i_push = next(i for i, l in enumerate(lines) if "---- donor push" in l)
    i_end = next(i for i, l in enumerate(lines)
                 if l.strip() == "h_out = jnp.where(active, h_out, NEV)")
    pre = lines[:i0]
    post = lines[i_end:]
    mid = []
    if keep_recur:
        mid += lines[i0:i_close]
    else:
        mid += ["            h_val = diag_h + score + left_h - up_h + up_f - e1",
                "            e_val = h_val - 1",
                "            f_val = h_val - 2",
                "            mx_val = h_val",
                "            mx_k = zero",
                "            state_vals = [h_val, e_val, f_val]"]
    if keep_close:
        mid += lines[i_close:i_push]
    else:
        mid += ["            h_out = mx_val + accb + sig5 + d5cls",
                "            for c in range(ncls):",
                "                h_out = h_out + j4[c]",
                "            h_out = h_out + jnp.where(isdon, 1, 0) + jnp.where(isacc, 2, 0)",
                "            state_vals = [h_out, h_out, h_out]",
                "            mx_val = h_out"]
    if keep_push:
        mid += lines[i_push:i_end]
    else:
        mid += ["            h_out = mx_val"]
    return "\n".join(pre + mid + post)

def load_variant(name, subs):
    src = SRC.replace("from .params import", "from spaln_tpu.ops.params import")
    src = src.replace("from .dp_spliced_scan import", "from spaln_tpu.ops.dp_spliced_scan import")
    if isinstance(subs, tuple) and subs and subs[0] == "CUT":
        src = _cut_body(src, **subs[1])
    else:
        for old, new in subs:
            assert old in src, f"{name}: pattern missing"
            src = src.replace(old, new)
    p = pathlib.Path(f"/tmp/dpv_{name}.py")
    p.write_text(src)
    spec = importlib.util.spec_from_file_location(f"dpv_{name}", p)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"dpv_{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    from spaln_tpu.config import Config, resolve, CvsG
    from spaln_tpu.ops.params import DpParams
    from spaln_tpu.ops.dp_spliced_scan import prepare_spliced_batch
    from spaln_tpu.score.intron import IntronPenalty
    from spaln_tpu.score.simmtx import Simmtx
    from spaln_tpu.score.splice import build_splice_signals
    from spaln_tpu.score.tables import TableDir, find_table_dir
    from spaln_tpu.seq.codec import encode_dna

    cfg = resolve(Config(), CvsG)
    prm = DpParams.build(cfg, Simmtx.dna(), CvsG,
                         ipen=IntronPenalty(cfg, CvsG))
    tables = TableDir(find_table_dir())
    rng = np.random.default_rng(0)
    bases = np.array(list("ACGT"))
    B, M, W, L = 8, 96, 512, 128
    queries, genomes, sigs = [], [], []
    for _ in range(B):
        e = ["".join(rng.choice(bases, M // 3)) for _ in range(3)]
        i1 = "GTAAGT" + "".join(rng.choice(bases, 80)) + "TTTTTAG"
        g = e[0] + i1 + e[1] + e[2]
        queries.append(encode_dna("".join(e)))
        genomes.append(encode_dna(g))
        sigs.append(build_splice_signals(genomes[-1], cfg, tables))
    bp = prepare_spliced_batch(queries, genomes, prm, sigs=sigs,
                               lw=-(W // 2), up=-(W // 2) + W - 1, L=L)

    for nm, kw in [("min_body", {}), ("recur_only", {"keep_recur": True}),
                   ("recur_close", {"keep_recur": True, "keep_close": True}),
                   ("recur_push", {"keep_recur": True, "keep_push": True})]:
        VARIANTS[nm] = ("CUT", kw)
    only = sys.argv[1:] or list(VARIANTS)
    for name in only:
        try:
            mod = load_variant(name, VARIANTS[name])
            mod.run_spliced_batch_pallas(bp, prm, score_only=True)
            print(f"PASS {name}", flush=True)
        except Exception as e:  # noqa: BLE001
            key = [l for l in str(e).split("\n")
                   if "relayout" in l or "Mosaic failed" in l][:2]
            print(f"FAIL {name} | {' '.join(key)[:300]}", flush=True)


if __name__ == "__main__":
    main()
