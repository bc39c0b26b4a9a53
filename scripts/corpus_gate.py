"""Real-data end-to-end gate: spaln_tpu vs the compiled reference binary.

The reference's own regression recipe (seqdb/Makefile:69-75) run on the
reconstructed dictdisc corpus (make_corpus.py): both pipelines index the
same genome and map the same REAL cDNA queries with -Q7 semantics; gene
structures are diffed exon-by-exon.  Reports per-query structure
identity, exon-level precision/recall, and both pipelines' accuracy
against the planted truth.

Usage:
  python scripts/make_corpus.py /tmp/corpus --n-genes 2000
  python scripts/corpus_gate.py /tmp/corpus --n-queries 500 \
      [--ref-bin /tmp/refsrc/spaln] [--out CORPUS_GATE.json]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _read_fasta(path):
    recs, name, buf = [], None, []
    with open(path) as f:
        for line in f:
            if line.startswith(">"):
                if name:
                    recs.append((name, "".join(buf)))
                name = line[1:].split()[0]
                buf = []
            else:
                buf.append(line.strip())
    if name:
        recs.append((name, "".join(buf)))
    return recs


def _norm_qname(q: str) -> str:
    # the reference truncates fasta ids at the last '|' segment
    return q.split("|")[-1]


def parse_ref_o4(text: str) -> dict:
    """Reference -O4 exon rows -> {qname: (chr, strand, [intervals])}.
    Keeps the FIRST reported locus per query (best-scored)."""
    out: dict = {}
    strand_of: dict = {}
    for line in text.splitlines():
        if line.startswith("@"):
            # @ chr + ( a b ) qname ...
            toks = line.split()
            strand_of[_norm_qname(toks[6])] = (toks[1], toks[2])
            continue
        if line.startswith("#") or not line.strip():
            continue
        toks = line.split("\t")
        if len(toks) < 10:
            continue
        q = _norm_qname(toks[0].strip())
        chrn = toks[1].strip()
        gl, gr = int(toks[8]), int(toks[9])
        iv = (min(gl, gr), max(gl, gr))
        st = "+" if gl <= gr else "-"
        key = (chrn, st)
        if q not in out:
            out[q] = (chrn, st, [iv])
        elif out[q][0] == chrn and out[q][1] == st:
            out[q][2].append(iv)
    return {q: (c, s, sorted(ivs)) for q, (c, s, ivs) in out.items()}


def parse_ours_o4(text: str) -> dict:
    """spaln_tpu -O4 exon rows -> same shape as parse_ref_o4."""
    out: dict = {}
    for line in text.splitlines():
        if line.startswith(("#", "@")) or not line.strip():
            continue
        toks = line.split("\t")
        if len(toks) < 8:
            continue
        q = _norm_qname(toks[0])
        chrn, st = toks[1], toks[2]
        iv = (int(toks[5]), int(toks[6]))
        iv = (min(iv), max(iv))
        if q not in out:
            out[q] = (chrn, st, [iv])
        elif out[q][0] == chrn and out[q][1] == st:
            out[q][2].append(iv)
    return {q: (c, s, sorted(ivs)) for q, (c, s, ivs) in out.items()}


def load_truth(path) -> dict:
    out = {}
    with open(path) as f:
        for line in f:
            t = json.loads(line)
            out[_norm_qname(t["q"])] = (t["chr"], t["strand"],
                                        sorted(tuple(e) for e in t["exons"]))
    return out


def compare(a: dict, b: dict, names) -> dict:
    """Structure/exon agreement of a vs b over the query name list."""
    n = len(names)
    ident = loci = 0
    ex_a = ex_b = ex_common = 0
    missing_a = missing_b = 0
    for q in names:
        sa, sb = a.get(q), b.get(q)
        if sa is None:
            missing_a += 1
        if sb is None:
            missing_b += 1
        if sa is None or sb is None:
            continue
        loci += (sa[0], sa[1]) == (sb[0], sb[1])
        ident += sa == sb
        A = set((sa[0], sa[1], iv) for iv in sa[2])
        B = set((sb[0], sb[1], iv) for iv in sb[2])
        ex_a += len(A)
        ex_b += len(B)
        ex_common += len(A & B)
    return dict(n=n, identical=ident, same_locus=loci,
                pct_identical=round(100 * ident / max(n, 1), 2),
                exon_recall=round(ex_common / max(ex_b, 1), 4),
                exon_precision=round(ex_common / max(ex_a, 1), 4),
                missing_a=missing_a, missing_b=missing_b)


def make_protein_queries(corpus: str, n: int) -> tuple:
    """Translate the longest forward ORF of each corpus cDNA into a
    protein query set (the dictdisc.faa role, seqdb/Makefile:73-75)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from spaln_tpu.seq.codec import encode_dna, translate, decode_protein
    from spaln_tpu.seq.utilseq import find_orfs
    recs = _read_fasta(os.path.join(corpus, "corpus.cf"))
    out = os.path.join(corpus, f"queries_{n}.faa")
    names = []
    with open(out, "w") as f:
        for name, seq in recs:
            if len(names) >= n:
                break
            codes = encode_dna(seq.upper())
            orfs = find_orfs(codes, min_len=150, both_strands=False)
            if not orfs:
                continue
            s, e = max(orfs, key=lambda o: o[1] - o[0])[:2]
            aa = decode_protein(translate(codes[s:e]))
            aa = aa.rstrip("*")
            if len(aa) < 50:
                continue
            names.append(_norm_qname(name))
            f.write(f">{name}\n")
            for i in range(0, len(aa), 60):
                f.write(aa[i:i + 60] + "\n")
    return out, names


def run_reference(corpus: str, qfile: str, ref_bin: str,
                  protein: bool = False) -> tuple:
    # without ALN_TAB the binary spins forever retrying table-file opens
    # (observed: 1 query burned 90 s of mostly-sys time; with the env
    # set the same query maps in 27 ms)
    env = dict(os.environ, ALN_TAB="/root/reference/table")
    kind = "-KP" if protein else "-KD"
    marker = os.path.join(corpus,
                          "corpus_g.bkp" if protein else "corpus_g.bkn")
    if not os.path.exists(marker):
        subprocess.run([ref_bin, "-W", kind, "corpus_g.gf"], cwd=corpus,
                       check=True, capture_output=True, timeout=1800,
                       env=env)
    t0 = time.time()
    r = subprocess.run([ref_bin, "-Q7", "-O4", "-LS", "-pq",
                        "-d", "corpus_g", qfile], cwd=corpus,
                       capture_output=True, text=True, timeout=36000,
                       env=env)
    return parse_ref_o4(r.stdout), time.time() - t0


def run_ours(corpus: str, qfile: str, lanes: int = 128,
             batch: int = 16, platform: str = "cpu",
             protein: bool = False, passes: int = 1,
             chunk: int = 0) -> tuple:
    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1)     # kill -USR1 <pid> -> stack
    if platform:
        # the sandbox sitecustomize re-pins jax_platforms to the axon
        # TPU backend; force the requested platform before any device
        # touch (axon init can hang when the tunnel is unhealthy)
        import jax
        jax.config.update("jax_platforms", platform)
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          2.0)
    from spaln_tpu.cli import main as cli_main
    prefix = os.path.join(corpus, "tpu_g")
    if not os.path.exists(prefix + ".bkn.npz"):
        cli_main(["index", os.path.join(corpus, "corpus_g.gf"),
                  "-p", prefix])
    if protein and not os.path.exists(prefix + ".bkp.npz"):
        cli_main(["index", os.path.join(corpus, "corpus_g.gf"),
                  "-p", prefix, "-K", "P"])
    outp = os.path.join(corpus, "ours_o4.txt")
    from spaln_tpu.utils.metrics import metrics
    dt = stages = counters = None
    if chunk > 0:
        # checkpointed run: map `chunk` queries at a time, each chunk's
        # output committed to disk with a done-marker, so a tunnel hang
        # kills at most one chunk and the rerun resumes (the round-4
        # 2,000-query run died whole to a single 30-min hang)
        recs = _read_fasta(os.path.join(corpus, qfile))
        ckdir = os.path.join(corpus, f"ck_{os.path.basename(qfile)}")
        os.makedirs(ckdir, exist_ok=True)
        t_sum = 0.0
        stages = {}
        counters = {}
        for c0 in range(0, len(recs), chunk):
            part = os.path.join(ckdir, f"part_{c0:06d}.txt")
            if os.path.exists(part + ".done"):
                continue
            qpart = os.path.join(ckdir, f"q_{c0:06d}.fa")
            with open(qpart, "w") as f:
                for n, s in recs[c0:c0 + chunk]:
                    f.write(f">{n}\n{s}\n")
            metrics.timings.clear()
            metrics.counters.clear()
            t0 = time.time()
            cli_main(["map", qpart, "-d", prefix, "-O", "4", "-o", part,
                      "--batch", str(batch), "--lanes", str(lanes),
                      "--metrics"])
            t_sum += time.time() - t0
            for k, v in metrics.timings.items():
                stages[k] = round(stages.get(k, 0) + v, 2)
            for k, v in metrics.counters.items():
                counters[k] = counters.get(k, 0) + v
            with open(part + ".done", "w") as f:
                f.write("ok\n")
        text = ""
        for c0 in range(0, len(recs), chunk):
            with open(os.path.join(ckdir, f"part_{c0:06d}.txt")) as f:
                text += f.read()
        return parse_ours_o4(text), t_sum, stages, counters
    for _pass in range(max(passes, 1)):
        # pass 2+ measures the process-warm steady state: Mosaic kernel
        # compiles are per-process (not served by the persistent XLA
        # cache), so a fresh process conflates compile time with
        # mapping throughput
        metrics.timings.clear()
        metrics.counters.clear()
        t0 = time.time()
        cli_main(["map", os.path.join(corpus, qfile), "-d", prefix,
                  "-O", "4", "-o", outp, "--batch", str(batch),
                  "--lanes", str(lanes), "--metrics"])
        dt = time.time() - t0
        stages = {k: round(v, 2) for k, v in metrics.timings.items()}
        counters = dict(metrics.counters)
    return parse_ours_o4(open(outp).read()), dt, stages, counters


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus")
    ap.add_argument("--n-queries", type=int, default=200)
    ap.add_argument("--ref-bin", default="/tmp/refsrc/spaln")
    ap.add_argument("--out", default=None)
    ap.add_argument("--lanes", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--platform", default="cpu",
                    help="jax platform for our pipeline (cpu | axon)")
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--chunk", type=int, default=0,
                    help="checkpointed mapping in chunks of N queries "
                         "(resume-safe on a flaky tunnel); 0 = one run")
    ap.add_argument("--passes", type=int, default=1,
                help="mapping passes; the last pass's timing is\n"
                     "reported (2 = process-warm steady state)")
    ap.add_argument("--protein", action="store_true",
                    help="protein-query gate: longest-ORF translations "
                         "of the corpus cDNAs vs the reference -KP path "
                         "(the dictdisc.faa recipe, seqdb/Makefile:73-75)")
    a = ap.parse_args(argv)

    if a.protein:
        qpath, names = make_protein_queries(a.corpus, a.n_queries)
        qfile = os.path.basename(qpath)
    else:
        recs = _read_fasta(os.path.join(a.corpus,
                                        "corpus.cf"))[:a.n_queries]
        names = [_norm_qname(n) for n, _ in recs]
        qfile = f"queries_{a.n_queries}.cf"
        with open(os.path.join(a.corpus, qfile), "w") as f:
            for n, s in recs:
                f.write(f">{n}\n")
                for i in range(0, len(s), 60):
                    f.write(s[i:i + 60] + "\n")
    truth = load_truth(os.path.join(a.corpus, "truth.jsonl"))

    ref, t_ref = run_reference(a.corpus, qfile, a.ref_bin,
                               protein=a.protein)
    rep = {"n_queries": len(names),
           "protein": a.protein,
           "ref_seconds": round(t_ref, 1)}
    if not a.protein:
        # planted-exon truth is cDNA-exact; protein structures differ
        # legitimately at UTR exons, so the truth diff is cDNA-only
        rep["ref_vs_truth"] = compare(ref, truth, names)
    if not a.skip_ours:
        ours, t_ours, stages, counters = run_ours(
            a.corpus, qfile, a.lanes, a.batch, platform=a.platform,
            protein=a.protein, passes=a.passes, chunk=a.chunk)
        rep["ours_seconds"] = round(t_ours, 1)
        rep["platform"] = a.platform
        rep["queries_per_sec"] = round(len(names) / t_ours, 3)
        rep["stage_seconds"] = stages
        rep["counters"] = counters
        rep["ours_vs_ref"] = compare(ours, ref, names)
        if not a.protein:
            rep["ours_vs_truth"] = compare(ours, truth, names)
        # per-query triage of every disagreement (bounded): the raw
        # structures, so divergences are classifiable without a re-run
        mm = []
        for q in names:
            sa, sb = ours.get(q), ref.get(q)
            if sa == sb:
                continue
            mm.append({"q": q, "ours": sa, "ref": sb,
                       "truth": (list(truth[q]) if q in truth
                                 else None)})
            if len(mm) >= 50:
                break
        rep["mismatches"] = mm
    out = a.out or os.path.join(a.corpus, "CORPUS_GATE.json")
    with open(out, "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
