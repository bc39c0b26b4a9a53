#!/usr/bin/env python3
"""Time the real Pallas slab kernel with sections knocked out, at bench
geometry, to attribute the per-step cost.  Textual variants of
dp_spliced_pallas.py, timed on-chip via run_spliced_batch_pallas.
"""
import importlib.util
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SRC = pathlib.Path("/root/repo/spaln_tpu/ops/dp_spliced_pallas.py").read_text()

VARIANTS = {
    "full": [],
    "no_ipen": [(
        "                pen = ipen_of(ilen)",
        "                pen = ilen * 0 - 500")],
    "no_tail": [(
        "        if iprlmt is not None:\n            x = jnp.maximum",
        "        if False:\n            x = jnp.maximum")],
    "no_close": [(
        "            for k in range(nstate):\n                cur = state_vals[k]",
        "            for k in range(0):\n                cur = state_vals[k]")],
    "no_push": [(
        "            don_ok = isdon & internal_m & active & (n < Nb)\n            for k in range(nstate):",
        "            don_ok = isdon & internal_m & active & (n < Nb)\n            for k in range(0):")],
    "no_roll": [(
        "            w = roll(wide, -r, 1)[:, :L]         # (SOP*GRP, L)",
        "            w = wide[:, :L] + r * 0              # (SOP*GRP, L)")],
    "no_fills": [(
        "            fv = jnp.sum(jnp.where(el3 == t2, fl, 0), axis=2,\n"
        "                         keepdims=True)          # (3, GRP, 1)",
        "            fv = jnp.zeros((3, GRP, 1), jnp.int32) + t2 * 0")],
    "chunk512": [(
        "CHUNK = 256                      # steps per grid program (lane tile)",
        "CHUNK = 512                      # steps per grid program (lane tile)")],
    "grp32": [(
        "GRP = 16                         # problems per program (sublane tile)",
        "GRP = 32                         # problems per program (sublane tile)")],
    "grp8": [(
        "GRP = 16                         # problems per program (sublane tile)",
        "GRP = 8                          # problems per program (sublane tile)")],
    "chunk128": [(
        "CHUNK = 256                      # steps per grid program (lane tile)",
        "CHUNK = 128                      # steps per grid program (lane tile)")],
    "no_emis": [(
        "            row_v = jnp.sum(jnp.where(li_mask, h_out, 0), axis=1,\n"
        "                            keepdims=True)",
        "            row_v = h_out[:, 0:1]"), (
        "            rc_v = jnp.sum(jnp.where(lanes == rcl[:, None], h_out, 0),\n"
        "                           axis=1, keepdims=True)",
        "            rc_v = h_out[:, 1:2]")],
}


def load_variant(name, subs):
    src = SRC.replace("from .params import",
                      "from spaln_tpu.ops.params import")
    src = src.replace("from .dp_spliced_scan import",
                      "from spaln_tpu.ops.dp_spliced_scan import")
    for old, new in subs:
        assert old in src, f"{name}: pattern missing"
        src = src.replace(old, new)
    p = pathlib.Path(f"/tmp/dpt_{name}.py")
    p.write_text(src)
    spec = importlib.util.spec_from_file_location(f"dpt_{name}", p)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"dpt_{name}"] = mod
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
    B, M, W, L = 256, 512, 4096, 128
    queries, genomes, sigs = [], [], []
    for _ in range(B):
        e = ["".join(rng.choice(bases, M // 3)) for _ in range(3)]
        g = (e[0] + "GTAAGT" + "".join(rng.choice(bases, 300))
             + "TTTTTAG" + e[1] + "GTGAGT"
             + "".join(rng.choice(bases, 500)) + "TTTCTAG" + e[2])
        queries.append(encode_dna("".join(e)))
        genomes.append(encode_dna(g))
        sigs.append(build_splice_signals(genomes[-1], cfg, tables))
    bp = prepare_spliced_batch(queries, genomes, prm, sigs=sigs,
                               lw=-(W // 2), up=-(W // 2) + W - 1, L=L)
    steps = (B // 8) * bp.n_slabs * (-(-bp.T // 128) * 128)
    print(f"geometry: T={bp.T} slabs={bp.n_slabs} steps={steps}")

    only = sys.argv[1:] or list(VARIANTS)
    results = {}
    for name in only:
        try:
            if hasattr(bp, "_pallas_prep"):
                del bp._pallas_prep
            mod = load_variant(name, VARIANTS[name])
            mod.run_spliced_batch_pallas(bp, prm, score_only=True)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                mod.run_spliced_batch_pallas(bp, prm, score_only=True)
                ts.append(time.perf_counter() - t0)
            dt = sorted(ts)[1]
            results[name] = dt
            print(f"{name:10s} {dt*1e3:8.1f} ms  "
                  f"{dt/steps*1e9:7.1f} ns/step", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} FAILED {str(e)[:120]}", flush=True)
    if "full" in results:
        base = results["full"]
        for name, dt in results.items():
            if name != "full":
                print(f"  {name:10s} saves {(base-dt)/steps*1e9:7.1f} "
                      "ns/step")


if __name__ == "__main__":
    main()
