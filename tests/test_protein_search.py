import numpy as np
import pytest

from spaln_tpu.align.protein_search import search_protein_db
from spaln_tpu.seq.codec import encode_protein


AAS = list("ARNDCQEGHILKMFPSTWYV")


def _mut(rng, s, rate):
    return "".join(rng.choice(AAS) if rng.random() < rate else c for c in s)


def test_protein_db_search_ranks_homolog(table_dir, rng):
    target = "".join(rng.choice(AAS, 120))
    db = []
    for i in range(20):
        decoy = "".join(rng.choice(AAS, int(rng.integers(80, 160))))
        db.append((f"decoy{i}", encode_protein(decoy)))
    homolog = _mut(rng, target, 0.15)
    db.insert(7, ("homolog", encode_protein(homolog)))
    hits = search_protein_db(encode_protein(target), db,
                             table_dir="/root/reference/table",
                             max_hits=5, align_top=1, lanes=32)
    assert hits[0].name == "homolog"
    assert hits[0].structure is not None
    assert hits[0].identity > 0.7
    assert hits[0].score > 2 * hits[1].score


def test_protein_db_search_blosum(table_dir, rng):
    target = "".join(rng.choice(AAS, 80))
    db = [("self", encode_protein(target)),
          ("junk", encode_protein("".join(rng.choice(AAS, 80))))]
    hits = search_protein_db(encode_protein(target), db,
                             matrix=table_dir.path("blosum62"),
                             max_hits=2, lanes=32)
    assert hits[0].name == "self"
    assert hits[0].identity == 1.0
