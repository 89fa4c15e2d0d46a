"""Golden adversarial-FASTA fixture, driven through the CLI end-to-end.

The reference's parser tolerates real-world FASTA mess (CRLF, lowercase,
'*' stops, blank lines, whitespace — sequences.c:64-80 reads byte-wise and
encodes anything non-alphabetic as dummy).  This fixture bakes every
adversarial shape into ONE database and checks the full pipeline — both
parsers, preprocess, CLI search, ranking — against the independent numpy
oracle.  A broken parser (mis-split records, leaked whitespace) or a
broken tie-break (duplicate sequences must rank by ascending sorted id)
fails these asserts.
"""

import json
import os

import numpy as np
import pytest

from oswald_tpu.alphabet import encode
from oswald_tpu.core import sw_score_numpy
from oswald_tpu.submat import get_submat

AA = "ACDEFGHIKLMNPQRSTVWY"


def _titin_like(rng, n=5478):
    return "".join(rng.choice(list(AA), n))


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    """(fasta_path, records) — records as [(title, clean_residue_str)]."""
    rng = np.random.default_rng(1234)
    mk = lambda n: "".join(rng.choice(list(AA), n))

    plain = mk(80)
    lower = mk(64)
    stops = mk(30) + "*" + mk(25) + "*"
    crlf = mk(120)
    multi = mk(200)
    dup = mk(55)
    titin = _titin_like(rng)

    # on-disk bytes (adversarial) vs the clean residues a correct parser
    # must recover
    chunks = [
        (">plain record 1", plain, "\n"),
        # CRLF line endings
        (">crlf record\r", crlf, "\r\n"),
        # lowercase residues (must encode case-insensitively)
        (">lower record", lower.lower(), "\n"),
        # '*' stop codons -> dummy residues (kept, encoded as dummy)
        (">stops record", stops, "\n"),
        # duplicate headers, identical sequence (tie-break fodder)
        (">dup record", dup, "\n"),
        (">dup record", dup, "\n"),
        # multi-line record with blank lines inside and spaces/tabs
        (">multiline record",
         multi[:60] + "\n" + " \t\n" + multi[60:140] + " \n" + multi[140:],
         "\n"),
        # titin-scale record (the reference's 5478 channel-depth limit)
        (">titin-like Q8WZ42", titin, "\n"),
    ]
    text = ""
    for hdr, body, eol in chunks:
        lines = body.split("\n") if "\n" in body else \
            [body[i:i + 61] for i in range(0, len(body), 61)]
        text += hdr + "\n" + eol.join(lines) + eol
    # blank line between records + no trailing newline on the final record
    text = text.replace(">dup record", "\n>dup record", 1)
    text = text.rstrip("\n")

    def clean(s):
        return "".join(c for c in s if c not in " \t\r\n")

    records = [
        ("plain record 1", clean(plain)),
        ("crlf record", clean(crlf)),
        ("lower record", clean(lower.lower())),
        ("stops record", clean(stops)),
        ("dup record", clean(dup)),
        ("dup record", clean(dup)),
        ("multiline record", clean(multi)),
        ("titin-like Q8WZ42", clean(titin)),
    ]
    d = tmp_path_factory.mktemp("golden")
    path = str(d / "golden.fasta")
    with open(path, "w", newline="") as f:
        f.write(text)
    return path, records


def test_both_parsers_recover_the_records(golden):
    path, records = golden
    from oswald_tpu.io.fasta import parse_fasta_bytes
    data = open(path, "rb").read()
    got = [parse_fasta_bytes(data)]
    from oswald_tpu.io import native
    if native.available() and not os.environ.get("OSWALD_NO_NATIVE"):
        got.append(native.parse_fasta_bytes(data))
    for titles, seqs, lengths in got:
        assert titles == [t for t, _ in records]
        offs = np.concatenate([[0], np.cumsum(lengths)])
        for i, (_, body) in enumerate(records):
            want = encode(body)
            np.testing.assert_array_equal(
                seqs[offs[i]:offs[i + 1]], want,
                err_msg=f"record {i} ({records[i][0]})")


def test_golden_cli_end_to_end(golden, tmp_path, capsys):
    path, records = golden
    from oswald_tpu.cli import main
    dbp = str(tmp_path / "gdb")
    assert main(["preprocess", "-i", path, "-o", dbp]) == 0

    # query = the duplicated record; its two copies tie at the self-score
    # and must rank 1-2 in ascending sorted-id order
    qpath = str(tmp_path / "q.fasta")
    dup_body = records[4][1]
    with open(qpath, "w") as f:
        f.write(">dupq\n" + dup_body + "\n")
    capsys.readouterr()
    assert main(["search", "-q", qpath, "-d", dbp,
                 "-r", str(len(records)), "--devices", "1", "--json"]) == 0
    out = capsys.readouterr().out
    hits = json.loads(out.splitlines()[-2])["hits"]

    # oracle over the clean records, in the db's sorted-id space
    # (length-ascending stable sort of the original record order)
    q = encode(dup_body)
    sm = get_submat("blosum62")
    lengths = np.array([len(b) for _, b in records])
    order = np.argsort(lengths, kind="stable")
    oracle = np.array([sw_score_numpy(q, encode(records[src][1]), sm, 10, 2)
                       for src in order])
    rank = np.lexsort((np.arange(len(records)), -oracle))
    assert [h["score"] for h in hits] == oracle[rank].tolist()
    assert [h["id"] for h in hits] == rank.tolist()
    assert [h["title"] for h in hits] == \
        [records[order[i]][0] for i in rank]
    # the two dup copies rank first (self-score) in ascending id order
    assert hits[0]["title"] == "dup record" and \
        hits[1]["title"] == "dup record"
    assert hits[0]["score"] == hits[1]["score"] == \
        sum(int(sm[c, c]) for c in q)
    assert hits[0]["id"] < hits[1]["id"]
