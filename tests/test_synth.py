"""Realistic-corpus generator (io/synth.py): composition, length mixture,
homolog planting, FASTA round trip."""

import numpy as np

from oswald_tpu.alphabet import encode, DUMMY
from oswald_tpu.io.synth import (realistic_lengths, realistic_residues,
                                 residue_distribution, mutate,
                                 make_realistic_corpus, write_fasta)


def test_residue_composition(rng):
    codes, probs = residue_distribution()
    assert np.isclose(probs.sum(), 1.0)
    flat = realistic_residues(rng, 200_000)
    assert flat.dtype == np.int8
    assert flat.min() >= 0 and flat.max() <= 22       # never DUMMY
    # leucine (the most common residue, ~9%) vs tryptophan (~1.3%):
    # the skew must survive into the sample
    leu, trp = encode("L")[0], encode("W")[0]
    f_leu = (flat == leu).mean()
    f_trp = (flat == trp).mean()
    assert 0.07 < f_leu < 0.11
    assert 0.008 < f_trp < 0.019
    assert f_leu > 4 * f_trp


def test_length_mixture(rng):
    lengths = realistic_lengths(rng, 50_000)
    assert lengths.min() >= 20
    assert lengths.max() <= 5478
    assert (lengths == 5478).any()                    # titin planted
    frag = (lengths <= 120).mean()
    assert 0.08 < frag < 0.30                         # fragment tail
    assert (lengths > 1000).mean() > 0.01             # giants exist
    med = np.median(lengths[(lengths > 120)])
    assert 180 < med < 450                            # SwissProt-ish body


def test_mutate_properties(rng):
    codes, _ = residue_distribution()
    seq = rng.choice(codes, size=400).astype(np.int8)
    hom = mutate(seq, rng, identity=0.6)
    assert hom.dtype == np.int8
    assert hom.size > 0
    assert abs(hom.size - seq.size) < 100             # indels are short
    # positional identity is only meaningful without frame-shifting
    # indels: ~0.6 kept + chance matches on the substituted rest
    sub = mutate(seq, rng, identity=0.6, indel_rate=0.0)
    assert sub.size == seq.size
    ident = (sub == seq).mean()
    assert 0.5 < ident < 0.8


def test_corpus_fasta_roundtrip(rng, tmp_path):
    flat, lengths, titles = make_realistic_corpus(
        rng, 50, planted=[np.zeros(30, np.int8)])
    assert titles[-1] == "planted_0"
    assert lengths[-1] == 30
    assert lengths.sum() == flat.size
    path = str(tmp_path / "c.fasta")
    write_fasta(path, flat, lengths, titles)
    from oswald_tpu.io.db import preprocess_db, load_db
    preprocess_db(path, str(tmp_path / "c"))
    db = load_db(str(tmp_path / "c"))
    assert db.n_seqs == 51
    assert db.n_residues == int(lengths.sum())
    assert sorted(db.lengths.tolist()) == sorted(lengths.tolist())
    # round trip one sequence bit-exactly through pack + decode
    sid = db.titles.index("planted_0")
    np.testing.assert_array_equal(db.sequence_of(sid),
                                  np.zeros(30, np.int8))
