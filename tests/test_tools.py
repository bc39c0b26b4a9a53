"""Species-parameter pipeline tools: kmers, exinpot, npssm, fitild,
make_ssp (perl/make_ssp.pl + npssm/exinpot/fitild binaries roles)."""
import numpy as np
import pytest

from spaln_tpu.seq.codec import encode_dna
from spaln_tpu.tools.kmers import count_kmers, write_wdfq, read_wdfq
from spaln_tpu.tools.exinpot import build_codepot, build_exinpot, \
    write_codepot, write_exinpot
from spaln_tpu.tools.npssm import build_pssm, write_pssm
from spaln_tpu.tools.fitild import fit_ild, sample_frechet_mixture


def _mk(rng, n, p=None):
    return "".join(rng.choice(np.array(list("ACGT")), n, p=p))


def test_count_kmers_basic():
    s = encode_dna("ACGTACGT")
    c1 = count_kmers([s], 1)
    assert c1.tolist() == [2, 2, 2, 2]
    c2 = count_kmers([s], 2)
    assert c2[0b0001] == 2          # AC
    assert c2.sum() == 7


def test_wdfq_roundtrip(tmp_path, rng):
    seqs = [encode_dna(_mk(rng, 500))]
    p = str(tmp_path / "x.wdfq")
    write_wdfq(p, seqs, kmax=3)
    tabs = read_wdfq(p, kmax=3)
    assert (tabs[0] == count_kmers(seqs, 1)).all()
    assert (tabs[2] == count_kmers(seqs, 3)).all()


def test_exinpot_discriminates(rng):
    # AT-rich "introns" vs uniform background
    fg = [encode_dna(_mk(rng, 400, p=[.4, .1, .1, .4])) for _ in range(20)]
    bg = [encode_dna(_mk(rng, 4000)) for _ in range(5)]
    pot = build_exinpot(fg, bg, morder=2)
    at_word = 0b000011 * 0 + (0 * 16 + 3 * 4 + 3)    # ATT
    gc_word = (1 * 16 + 2 * 4 + 1)                   # CGC
    assert pot[at_word] > 0 > pot[gc_word]


def test_codepot_phase_structure(rng):
    # synthetic CDS with a strong codon bias (always GCx)
    cds = []
    for _ in range(10):
        codons = ["GC" + rng.choice(list("ACGT")) for _ in range(100)]
        cds.append(encode_dna("".join(codons)))
    bg = [encode_dna(_mk(rng, 5000)) for _ in range(2)]
    pot = build_codepot(cds, bg, morder=2)
    assert pot.shape == (64, 4)
    # trimer GCN ends at phase 2 -> column 2 should be enriched
    gca = 2 * 16 + 1 * 4 + 0
    assert pot[gca, 2] > pot[gca, 0]


def test_exinpot_loader_roundtrip(tmp_path, rng):
    from spaln_tpu.score.codepot import ExinPot
    from spaln_tpu.score.tables import TableDir
    fg = [encode_dna(_mk(rng, 300)) for _ in range(5)]
    bg = [encode_dna(_mk(rng, 3000))]
    pot = build_exinpot(fg, bg, morder=3)
    write_exinpot(str(tmp_path / "IntronPotTab"), pot, nsupport=5,
                  avlen=100.)
    ep = ExinPot.load(TableDir(str(tmp_path)))
    assert ep is not None
    assert ep.morder == 3
    assert np.allclose(ep.data, pot, atol=5e-5)
    s = ep.scan(bg[0])
    assert len(s) == len(bg[0])


def test_npssm_donor_signal(tmp_path, rng):
    """PSSM trained on GTAAGT-consensus donors scores true donor sites
    above random positions after write/load."""
    from spaln_tpu.score.pssm import load_pssm, scan_pssm
    wins = []
    for _ in range(300):
        exon = _mk(rng, 1)
        rest = "".join(rng.choice(np.array(list("ACGT")), 2,
                                  p=[.5, .1, .2, .2]))
        wins.append(encode_dna(exon + "GTAAG" + rest + _mk(rng, 2)))
    bg = [encode_dna(_mk(rng, 8000))]
    bg1, bg2, bg3 = (count_kmers(bg, k) for k in (1, 2, 3))
    p = build_pssm(wins, offset=1, bg_mono=bg1, bg_di=bg2, bg_tri=bg3,
                   morder=2)
    path = str(tmp_path / "Splice5")
    write_pssm(path, p)
    p2 = load_pssm(path)
    assert p2.cols == p.cols and p2.offset == 1
    g = _mk(rng, 200) + "GGTAAGTAT" + _mk(rng, 200)
    scores = scan_pssm(p2, encode_dna(g), zero_tonic=True)
    don = 201                        # first intron base (G of GTAAGT)
    assert scores[don] >= np.percentile(scores, 99)


def test_fitild_recovers_mixture(rng):
    true_w, true_m, true_t, true_k = [0.7, 0.3], [30., 30.], [60., 600.], \
        [1.2, 1.8]
    lens = sample_frechet_mixture(rng, 4000, true_w, true_m, true_t,
                                  true_k)
    fit = fit_ild(lens, n_modes=2, steps=1500)
    assert fit.n == 4000
    th = sorted(fit.thetas)
    assert 30 < th[0] < 120
    assert 350 < th[1] < 1100
    line = fit.yI_line()
    assert len(line.split()) == 8


def test_make_ssp_end_to_end(tmp_path, rng):
    from spaln_tpu.seq.fasta import SeqRecord
    from spaln_tpu.seq.genome import GenomeStore
    from spaln_tpu.constants import DNA
    from spaln_tpu.tools.make_ssp import make_ssp
    from spaln_tpu.score.tables import TableDir
    from spaln_tpu.score.pssm import load_pssm

    # genome with 60 planted introns
    parts, introns = [], []
    pos = 0
    for _ in range(60):
        ex = _mk(rng, 150)
        parts.append(ex)
        pos += 150
        ilen = int(sample_frechet_mixture(rng, 1, [1.], [25.], [80.],
                                          [1.4])[0]) + 20
        parts.append("GTAAGT" + _mk(rng, ilen - 13) + "TTTCTAG")
        introns.append(("c1", "+", pos, pos + ilen))
        pos += ilen
    parts.append(_mk(rng, 150))
    store = GenomeStore.from_records(
        [SeqRecord("c1", encode_dna("".join(parts)), DNA)])
    res = make_ssp(str(tmp_path), store, introns, fit_steps=400)
    assert res["n_donor"] == 60 and res["n_accept"] == 60
    assert set(res["files"]) >= {"Splice5", "Splice3", "AlnParam",
                                 "IntronPotTab"}
    td = TableDir(str(tmp_path))
    p5 = load_pssm(td.path("Splice5"))
    assert p5.nsupport == 60
    line = open(td.path("AlnParam")).read()
    assert line.startswith("-yI\"")


def test_ild_compare_decompose_plot(rng):
    from spaln_tpu.tools.fitild import (IldFit, compare_ilds,
                                        decompose_ild, ild_pdf,
                                        plot_ild_text,
                                        sample_frechet_mixture)
    f1 = IldFit([0.6, 0.4], [20., 20.], [80., 600.], [1.2, 1.5], 0., 100)
    f2 = IldFit([1.0], [20.], [100.], [1.3], 0., 100)
    assert compare_ilds(f1, f1) == 0.0
    assert compare_ilds(f1, f2) > 0.01
    x = np.array([50., 200., 1000.])
    comp = decompose_ild(f1, x)
    assert comp.shape == (2, 3)
    assert np.allclose(comp.sum(axis=0), ild_pdf(f1, x))
    lens = sample_frechet_mixture(rng, 500, f1.weights, f1.mus,
                                  f1.thetas, f1.kappas)
    lines = plot_ild_text(f1, lens)
    assert len(lines) == 24 and any("*" in l for l in lines)


def test_ild_cli_family(tmp_path):
    """fitild / compild / decompild / plotild as CLI subcommands."""
    import numpy as np
    from spaln_tpu.cli import main as cli_main
    from spaln_tpu.tools.fitild import sample_frechet_mixture
    rng = np.random.default_rng(3)
    lens = sample_frechet_mixture(rng, 800, [1.0], [30.], [120.], [1.1])
    f = tmp_path / "lens.txt"
    f.write_text("\n".join(str(int(x)) for x in lens) + "\n")
    fit_out = tmp_path / "fit.json"
    cli_main(["ild", "fit", str(f), "-m", "1", "-o", str(fit_out)])
    first = fit_out.read_text().splitlines()
    assert first[1].startswith("-yI")
    saved = tmp_path / "a.ild.json"
    saved.write_text(first[0])
    # compare a fit against itself -> ~0 divergence
    cmp_out = tmp_path / "cmp.txt"
    cli_main(["ild", "compare", str(saved), str(saved), "-o",
              str(cmp_out)])
    assert float(cmp_out.read_text().split()[-1]) < 1e-9
    dec_out = tmp_path / "dec.txt"
    cli_main(["ild", "decompose", str(saved), "-o", str(dec_out)])
    assert dec_out.read_text().startswith("#len")
    plot_out = tmp_path / "plot.txt"
    cli_main(["ild", "plot", str(saved), str(f), "-o", str(plot_out)])
    assert "*" in plot_out.read_text()
