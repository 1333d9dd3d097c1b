import numpy as np

from marie_tpu.api.docs import AssetKeyDoc, BatchableMarieDoc, MarieDoc, StorageDoc
from marie_tpu.types.docs import Document, DocumentArray


def test_document_roundtrip():
    d = Document(text="hello", tensor=np.arange(6, dtype=np.float32).reshape(2, 3))
    d2 = Document.from_json(d.to_json())
    assert d2.text == "hello"
    np.testing.assert_array_equal(d2.tensor, d.tensor)
    assert d2.id == d.id


def test_document_array_access():
    da = DocumentArray([Document(text=f"t{i}") for i in range(5)])
    assert len(da) == 5
    assert da[0].text == "t0"
    assert da.texts == [f"t{i}" for i in range(5)]
    assert len(da[1:3]) == 2
    doc = da[2]
    assert da[doc.id] is doc


def test_document_array_roundtrip():
    da = DocumentArray([Document(text="a", tags={"k": 1}), Document(blob=b"\x00\x01")])
    da2 = DocumentArray.from_json(da.to_json())
    assert da2[0].tags == {"k": 1}
    assert da2[1].blob == b"\x00\x01"


def test_asset_key_doc():
    d = AssetKeyDoc(asset_key="s3://bucket/doc.tif", pages=[1, 2])
    d2 = AssetKeyDoc.from_dict(d.to_dict())
    assert d2.asset_key == d.asset_key
    assert d2.pages == [1, 2]


def test_batchable_marie_doc():
    d = BatchableMarieDoc(words=["a", "b"], boxes=[[0, 0, 1, 1], [1, 1, 2, 2]])
    assert d.words == ["a", "b"]
    assert isinstance(d, MarieDoc)


def test_jax_array_coerced():
    import jax.numpy as jnp

    d = Document(tensor=jnp.ones((2, 2)))
    assert isinstance(d.tensor, np.ndarray)


def test_storage_doc():
    s = StorageDoc(content={"x": 1}, tags={"job": "j1"})
    assert s.content["x"] == 1
