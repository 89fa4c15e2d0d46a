"""HTTP search server: request/response parity with the direct engine,
error paths, counters.  Drives a real ThreadingHTTPServer on an ephemeral
port (CPU backend, interpreter-mode kernel)."""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from oswald_tpu.alphabet import ALPHABET
from oswald_tpu.io import pack_sequences
from oswald_tpu.engine import SearchEngine, SearchConfig
from oswald_tpu.serve import SearchService, make_server

from conftest import random_protein


@pytest.fixture(scope="module")
def server():
    rng = np.random.default_rng(7)
    n = 60
    lengths = rng.integers(20, 150, size=n)
    seqs = [random_protein(rng, int(l)) for l in lengths]
    db = pack_sequences(np.concatenate(seqs), lengths,
                        [f"srv{i}" for i in range(n)])
    engine = SearchEngine(db, SearchConfig(top=5))
    service = SearchService(db, engine)
    httpd = make_server(service, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://{httpd.server_address[0]}:{httpd.server_address[1]}"
    yield base, service, engine, seqs
    httpd.shutdown()
    httpd.server_close()


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _to_str(codes):
    return "".join(ALPHABET[c] for c in codes)


def test_healthz_and_info(server):
    base, service, engine, seqs = server
    code, h = _get(base + "/healthz")
    assert code == 200 and h["status"] == "ok"
    code, info = _get(base + "/info")
    assert code == 200
    assert info["db"]["n_seqs"] == 60
    assert info["config"]["matrix"] == "blosum62"


def test_search_parity_with_direct_engine(server):
    base, service, engine, seqs = server
    q = seqs[11]
    code, out = _post(base + "/search", {"query": _to_str(q)})
    assert code == 200
    hits = out["results"][0]["hits"]
    direct = engine.search(q)
    assert [h["score"] for h in hits] == [int(s) for s in direct.scores]
    assert [h["title"] for h in hits] == direct.titles
    # the self-sequence must rank first
    assert hits[0]["title"] == "srv11"
    # significance columns present (60-seq db supports the fit)
    assert "evalue" in hits[0] and "bits" in hits[0]
    assert out["search_s"] > 0 and out["gcups"] >= 0


def test_batch_titles_top_and_counters(server):
    base, service, engine, seqs = server
    before = service.n_queries
    payload = {"queries": [_to_str(seqs[3]), _to_str(seqs[4][:30])],
               "titles": ["a", "b"], "top": 2}
    code, out = _post(base + "/search", payload)
    assert code == 200
    assert [r["query"] for r in out["results"]] == ["a", "b"]
    assert all(len(r["hits"]) == 2 for r in out["results"])
    code, h = _get(base + "/healthz")
    assert h["queries"] == before + 2


def test_align_rescores(server):
    base, service, engine, seqs = server
    code, out = _post(base + "/search",
                      {"query": _to_str(seqs[20]), "align": True})
    assert code == 200
    top = out["results"][0]["hits"][0]
    aln = top["alignment"]
    # self-hit: a gapless identity alignment over the full sequence
    assert aln["gaps"] == 0
    assert aln["identities"] == len(seqs[20])
    assert aln["q_aln"] == aln["s_aln"] == _to_str(seqs[20])


def test_fasta_payload(server):
    base, service, engine, seqs = server
    fasta = (f">qa first query\n{_to_str(seqs[5])}\n"
             f">qb second\n{_to_str(seqs[8][:40])}\n")
    code, out = _post(base + "/search", {"fasta": fasta, "top": 1})
    assert code == 200
    assert [r["query"] for r in out["results"]] == ["qa first query",
                                                    "qb second"]
    assert out["results"][0]["hits"][0]["title"] == "srv5"
    # exclusive with query/queries
    code, out = _post(base + "/search", {"fasta": fasta, "query": "MKT"})
    assert code == 400 and "exclusive" in out["error"]
    code, out = _post(base + "/search", {"fasta": "not fasta at all"})
    assert code == 400


def test_concurrent_requests(server):
    """Engine dispatches serialise under the service lock; concurrent
    clients each get their own correct result."""
    base, service, engine, seqs = server
    results = {}

    def hit(qi):
        code, out = _post(base + "/search", {"query": _to_str(seqs[qi])})
        results[qi] = (code, out["results"][0]["hits"][0]["title"])

    threads = [threading.Thread(target=hit, args=(qi,))
               for qi in (7, 13, 25, 31)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert results == {qi: (200, f"srv{qi}") for qi in (7, 13, 25, 31)}


def test_micro_batching_coalesces_concurrent_requests(server):
    """Requests that arrive while the engine is busy coalesce into ONE
    `search_many` dispatch (cross-request micro-batching): N single-query
    clients cost ~2 engine dispatches, not N.  Deterministic: the first
    dispatch is gated on an event so the test controls the window."""
    base, service, engine, seqs = server
    calls = []
    release = threading.Event()
    real = engine.search_many

    def gated(queries, titles=None, batch=True):
        calls.append(len(queries))
        if len(calls) == 1:
            assert release.wait(timeout=60)
        return real(queries, titles, batch)

    engine.search_many = gated
    try:
        results = {}

        def hit(qi):
            out = service.search({"query": _to_str(seqs[qi])})
            results[qi] = out["results"][0]["hits"][0]["title"]

        threads = [threading.Thread(target=hit, args=(7,))]
        threads[0].start()
        # wait until the dispatcher is inside the gated first batch
        for _ in range(600):
            if calls:
                break
            time.sleep(0.01)
        assert calls, "dispatcher never picked up the first request"
        # three more clients queue while the engine is "busy"
        for qi in (13, 25, 31):
            threads.append(threading.Thread(target=hit, args=(qi,)))
            threads[-1].start()
        for _ in range(600):
            with service._cv:
                if len(service._queue) == 3:
                    break
            time.sleep(0.01)
        release.set()
        for t in threads:
            t.join(timeout=120)
        assert results == {qi: f"srv{qi}" for qi in (7, 13, 25, 31)}
        # 4 clients -> exactly 2 dispatches: the gated single, then the
        # coalesced batch of 3
        assert calls == [1, 3], calls
    finally:
        engine.search_many = real
        release.set()


def test_service_close_rejects_new_requests(server):
    base, service, engine, seqs = server
    svc = type(service)(service.db, engine)
    out = svc.search({"query": _to_str(seqs[2])})
    assert out["results"][0]["hits"][0]["title"] == "srv2"
    svc.close()
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        svc.search({"query": _to_str(seqs[2])})


def test_error_paths(server):
    base, service, engine, seqs = server
    code, out = _post(base + "/search", {})
    assert code == 400 and "query" in out["error"]
    code, out = _post(base + "/search", {"queries": []})
    assert code == 400
    code, out = _post(base + "/search", {"query": "MKT", "top": 99})
    assert code == 400 and "top" in out["error"]
    code, out = _post(base + "/search", {"query": "   "})
    assert code == 400
    code, out = _post(base + "/search",
                      {"queries": ["MKT"], "titles": ["a", "b"]})
    assert code == 400
    # malformed JSON body
    req = urllib.request.Request(
        base + "/search", data=b"{not json",
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            code = r.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 400
    code, out = _get(base + "/nope")
    assert code == 404


def test_type_confused_payloads(server):
    """Wrong-typed fields must come back as a 400 JSON error, not a
    dropped connection (the handler only caught ValueError before)."""
    base, service, engine, seqs = server
    for payload in ({"fasta": 123},
                    {"query": "MKT", "top": [1]},
                    {"query": "MKT", "top": "ten"},
                    {"query": "MKT", "top": True},
                    {"queries": ["MKT"], "titles": "a"},
                    {"queries": ["MKT"], "titles": [7]},
                    {"queries": [123]},
                    {"query": 42}):
        code, out = _post(base + "/search", payload)
        assert code == 400 and "error" in out, payload


def test_serve_distributed_engine(rng):
    """The service runs over the 8-virtual-device distributed engine,
    including the startup warmup (which DistributedSearchEngine must
    implement for the serve path)."""
    from oswald_tpu.dist import DistributedSearchEngine
    n = 40
    lengths = rng.integers(20, 100, size=n)
    seqs = [random_protein(rng, int(l)) for l in lengths]
    db = pack_sequences(np.concatenate(seqs), lengths,
                        [f"d{i}" for i in range(n)])
    eng = DistributedSearchEngine(db, SearchConfig(top=3))
    pads = eng.warmup(64)
    assert pads and pads[-1] >= 64
    service = SearchService(db, eng)
    out = service.search({"query": _to_str(seqs[17])})
    assert out["results"][0]["hits"][0]["title"] == "d17"


def test_cli_serve_parser():
    """The serve subcommand parses its flags (no server started)."""
    from oswald_tpu.cli.main import build_parser
    args = build_parser().parse_args(
        ["serve", "-d", "x.oswt", "-r", "20", "--port", "0",
         "--warmup-qlen", "0"])
    assert args.op == "serve" and args.top == 20 and args.warmup_qlen == 0


def test_serve_stress_mixed_concurrency(server):
    """30 requests from 6 concurrent client threads with mixed payload
    shapes (single, multi-query, fasta, with/without align): every reply
    correct, queue drained, counters consistent — the micro-batcher's
    soak test."""
    base, service, engine, seqs = server
    req0, q0 = service.n_requests, service.n_queries
    errors = []
    lock = threading.Lock()

    def client(ci):
        rng = np.random.default_rng(ci)
        for r in range(5):
            qi = int(rng.integers(0, len(seqs)))
            kind = (ci + r) % 3
            if kind == 0:
                payload = {"query": _to_str(seqs[qi])}
            elif kind == 1:
                payload = {"queries": [_to_str(seqs[qi]),
                                       _to_str(seqs[(qi + 1) % len(seqs)])]}
            else:
                payload = {"fasta": f">x{qi}\n{_to_str(seqs[qi])}\n"}
            code, out = _post(base + "/search", payload)
            ok = (code == 200 and
                  out["results"][0]["hits"][0]["title"] == f"srv{qi}")
            if not ok:
                with lock:
                    errors.append((ci, r, code, out))

    threads = [threading.Thread(target=client, args=(ci,))
               for ci in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors[:3]
    assert service.n_requests == req0 + 30
    # 10 of the 30 requests carried two queries
    assert service.n_queries == q0 + 40
    with service._cv:
        assert not service._queue            # fully drained
