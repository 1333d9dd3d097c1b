"""Property-based fuzz over the pure core surfaces (wire round-trip,
JAML substitution, client chunking, reduce/merge semantics, payload
sniffing) — the adversarial-input hardening the reference accumulated by
years of production traffic, pinned here generatively."""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from marie_tpu.clients.helper import chunk_docs
from marie_tpu.serve.runtimes.worker.request_handling import WorkerRequestHandler
from marie_tpu.types.docs import Document, DocumentArray
from marie_tpu.types.request import DataRequest

FAST = settings(
    max_examples=50, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

texts = st.text(min_size=0, max_size=40)
ids = st.text(
    alphabet="abcdefghij0123456789-", min_size=1, max_size=12
)
json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(-10**6, 10**6),
    st.floats(allow_nan=False, allow_infinity=False, width=32), texts,
)
params = st.dictionaries(
    st.text(min_size=1, max_size=10), json_scalars, max_size=5
)


def _docs(items):
    return DocumentArray(
        [Document(id=i, text=t, tags=dict(tags)) for i, t, tags in items]
    )


doc_items = st.lists(
    st.tuples(ids, texts, st.dictionaries(
        st.text(min_size=1, max_size=8), json_scalars, max_size=3)),
    max_size=8,
)


@FAST
@given(items=doc_items, p=params, endpoint=texts, target=texts)
def test_datarequest_wire_roundtrip(items, p, endpoint, target):
    req = DataRequest.from_docs(
        _docs(items), endpoint=endpoint or "/", parameters=p,
        target_executor=target,
    )
    back = DataRequest.from_bytes(req.to_bytes())
    assert back.exec_endpoint == (endpoint or "/")
    assert back.target_executor == target
    assert [d.id for d in back.docs] == [i for i, _, _ in items]
    assert [d.text for d in back.docs] == [t for _, t, _ in items]
    # parameters survive with JSON-equivalent values
    assert json.loads(json.dumps(back.parameters)) == json.loads(
        json.dumps(p)
    )


@FAST
@given(items=doc_items, size=st.integers(min_value=-3, max_value=12))
def test_chunk_docs_partitions_in_order(items, size):
    docs = _docs(items)
    chunks = chunk_docs(docs, size)
    flat = [d.id for c in chunks for d in c]
    assert flat == [d.id for d in docs]
    if size > 0 and len(docs) > size:
        assert all(len(c) <= size for c in chunks)
        assert all(len(c) == size for c in chunks[:-1])
    else:
        assert len(chunks) == 1


@FAST
@given(a=doc_items, b=doc_items)
def test_reduce_docs_dedupes_first_wins(a, b):
    r1 = DataRequest.from_docs(_docs(a), endpoint="/")
    r2 = DataRequest.from_docs(_docs(b), endpoint="/")
    merged = WorkerRequestHandler.reduce_docs([r1, r2])
    seen = {}
    for i, t, _ in a + b:
        seen.setdefault(i, t)
    assert [d.id for d in merged] == list(seen)
    for d in merged:
        assert d.text == seen[d.id]  # first occurrence won


@FAST
@given(routes=st.lists(st.lists(ids, max_size=4), min_size=1, max_size=4))
def test_merge_routes_union_by_executor(routes):
    reqs = []
    for hops in routes:
        r = DataRequest.from_docs(DocumentArray(), endpoint="/")
        for h in hops:
            r.add_route(
                h, "2026-08-19T00:00:00+00:00", "2026-08-19T00:00:01+00:00"
            )
        reqs.append(r)
    own = list(routes[0])
    WorkerRequestHandler.merge_routes(reqs)
    names = [r.executor for r in reqs[0].routes]
    # reference contract (:855): the first request's own routes are kept
    # verbatim; LATER requests' routes are added deduped by executor
    assert names[: len(own)] == own
    added = names[len(own):]
    assert len(added) == len(set(added))
    assert set(names) == {h for hops in routes for h in hops}


@FAST
@given(raw=st.text(max_size=200), labels=st.lists(
    st.text(min_size=1, max_size=10), min_size=1, max_size=4, unique=True))
def test_parse_entities_total_on_garbage(raw, labels):
    from marie_tpu.components.llm_ner import parse_entities

    out = parse_entities(raw, labels)
    assert sorted(out) == sorted(labels)
    assert all(isinstance(v, list) for v in out.values())


@FAST
@given(data=st.binary(max_size=64))
def test_sniff_file_type_total(data):
    from marie_tpu.api.payload import ALLOWED_TYPES, sniff_file_type

    kind = sniff_file_type(data)
    assert kind is None or kind in ALLOWED_TYPES


@FAST
@given(ref=st.text(min_size=1, max_size=40), rt=st.text(min_size=1, max_size=20))
def test_s3_asset_path_never_traverses(ref, rt):
    from marie_tpu.pipe.assets import s3_asset_path, split_filename

    filename, prefix, suffix = split_filename(ref)
    assert filename  # total
    path = s3_asset_path(ref, rt)
    assert path.startswith("s3://")
    assert ".." not in path.split("://", 1)[1].replace("_", "")


@FAST
@given(
    default=st.text(
        alphabet="abcdefghijkl0123456789", max_size=20
    ),
)
def test_jaml_env_substitution_total(default):
    from marie_tpu.jaml import JAML

    cfg = JAML.load_config(
        "a: ${{ ENV.MARIE_FUZZ_UNSET_VAR"
        + (f" | {default} " if default else " ")
        + "}}\n"
    )
    got = cfg["a"]
    if default:
        assert got is not None  # the default substituted
    else:
        assert got is None  # missing ENV -> None (pinned edge semantics)
