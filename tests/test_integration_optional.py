"""Auto-skipping integration suites for the import-gated production tiers
(round-3 verdict item 7).

The hermetic fakes are covered elsewhere; these exercise the REAL code
paths wherever the optional dependency is installed, and skip cleanly
(``pytest.importorskip``) where it isn't — so any dep-present environment
immediately runs them with zero configuration.
"""

import numpy as np
import pytest


# ---------------------------------------------------------------- PIL tier

def _png_bytes(w=32, h=16, color=(200, 10, 10)):
    from PIL import Image
    import io

    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


def test_image_features_real_decode(spark):
    pytest.importorskip("PIL")
    from lotus_spark.sources.multimodal import image_features

    df = spark.createDataFrame(
        [("img://a", bytearray(_png_bytes(32, 16)))], ["uri", "media"]
    )
    row = image_features(df, fake=False).collect()[0]
    assert (row["width"], row["height"]) == (32, 16)
    # uniform image → aHash of all-zero bits
    assert row["phash"] == "0" * 16


def test_image_resize_real(spark):
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from lotus_spark.sources.multimodal import image_resize

    df = spark.createDataFrame(
        [("img://a", bytearray(_png_bytes(64, 64)))], ["uri", "media"]
    )
    row = image_resize(df, 8, 8, fake=False).collect()[0]
    img = Image.open(io.BytesIO(bytes(row["media"])))
    assert img.size == (8, 8)


# ------------------------------------------------------------ pymupdf tier

def test_pdf_extraction_real(spark, tmp_path):
    fitz = pytest.importorskip("fitz")
    from lotus_spark.sources.connectors import load_files

    doc = fitz.open()
    for i in range(2):
        page = doc.new_page()
        page.insert_text((72, 72), f"hello page {i}")
    pdf_path = tmp_path / "sample.pdf"
    doc.save(str(pdf_path))
    doc.close()

    out = load_files(spark, str(tmp_path), glob="*.pdf").collect()
    pages = {r["page_label"]: r["content"] for r in out}
    assert "hello page 0" in pages["1"]
    assert "hello page 1" in pages["2"]


def test_docx_extraction_real(spark, tmp_path):
    docx = pytest.importorskip("docx")
    from lotus_spark.sources.connectors import load_files

    d = docx.Document()
    d.add_paragraph("alpha beta")
    d.save(str(tmp_path / "sample.docx"))
    out = load_files(spark, str(tmp_path), glob="*.docx").collect()
    assert any("alpha beta" in r["content"] for r in out)


# -------------------------------------------------------------- faiss tier

def test_broadcast_index_faiss_matches_numpy():
    pytest.importorskip("faiss")
    from lotus_spark.models.vs import BroadcastVectorIndex

    rng = np.random.default_rng(0)
    mat = rng.normal(size=(50, 8)).astype(np.float32)
    ids = np.arange(50)
    q = rng.normal(size=(3, 8)).astype(np.float32)

    ix_faiss = BroadcastVectorIndex(ids, mat)
    assert ix_faiss._faiss_index() is not None  # really on the faiss path
    got_ids, got_scores = ix_faiss.search(q, K=5)

    ix_np = BroadcastVectorIndex(ids, mat)
    ix_np._faiss_tried, ix_np._faiss = True, None  # force numpy path
    exp_ids, exp_scores = ix_np.search(q, K=5)
    assert np.array_equal(got_ids, exp_ids)
    assert np.allclose(got_scores, exp_scores, atol=1e-5)


# ------------------------------------------------------------ litellm tier

def test_litellm_rm_real_module_wiring(monkeypatch):
    """With litellm installed, LiteLLMRM resolves the REAL module import;
    the network call itself is stubbed at the litellm boundary (no API key
    in CI), so batching/ordering logic runs against the real import."""
    litellm = pytest.importorskip("litellm")
    from lotus_spark.models.rm import LiteLLMRM

    def fake_embedding(model, input):
        return {
            "data": [
                {"index": i, "embedding": [float(len(s)), 1.0]}
                for i, s in reversed(list(enumerate(input)))
            ]
        }

    monkeypatch.setattr(litellm, "embedding", fake_embedding)
    rm = LiteLLMRM(model="text-embedding-3-small", max_batch_size=2)
    out = rm(["a", "bb", "ccc"])
    assert out.shape == (3, 2)
    assert [v[0] for v in out] == [1.0, 2.0, 3.0]  # request order restored


# ------------------------------------------------------------ colbert tier

def test_colbert_real_backend_roundtrip(tmp_path):
    pytest.importorskip("colbert")
    pytest.importorskip("torch")
    from lotus_spark.models.colbert_rm import ColBERTv2RM

    docs = [f"document about topic {i}" for i in range(8)]
    rm = ColBERTv2RM(backend="colbert")
    rm.index(docs, str(tmp_path / "ix"))
    out = rm("document about topic 3", K=2)
    assert len(out.indices[0]) == 2


# ------------------------------------- sentence-transformers tier (heavy)

def test_sentence_transformers_rm_real():
    pytest.importorskip("sentence_transformers")
    import os

    if not os.environ.get("SPARK_GRAFT_RUN_MODEL_TESTS"):
        pytest.skip("set SPARK_GRAFT_RUN_MODEL_TESTS=1 to download models")
    from lotus_spark.models.rm import SentenceTransformersRM

    rm = SentenceTransformersRM(model="sentence-transformers/all-MiniLM-L6-v2")
    out = rm(["hello world", "goodbye"])
    assert out.shape[0] == 2 and out.shape[1] > 0


def test_qdrant_embedded_roundtrip():
    """QdrantVS against qdrant-client's EMBEDDED local mode (no server;
    round-5 advice item 7): create → upsert → cosine top-K, ids and
    order verified against numpy brute force."""
    pytest.importorskip("qdrant_client")
    import numpy as np

    from lotus_spark.models.vs import QdrantVS

    rng = np.random.RandomState(3)
    vecs = rng.randn(50, 8).astype(np.float32)
    vs = QdrantVS("t_embed", location=":memory:")
    vs.ensure_collection(dim=8)
    vs.upsert(np.arange(50), vecs)

    q = vecs[7]
    ids, scores = vs.search(q, K=5)
    assert ids.shape == (1, 5) and scores.shape == (1, 5)
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    expect = np.argsort(-(norm @ (q / np.linalg.norm(q))))[:5]
    assert list(ids[0]) == list(expect)
    assert ids[0][0] == 7                       # self-match first
    assert scores[0][0] == pytest.approx(1.0, abs=1e-5)
    # scores descend
    assert all(a >= b for a, b in zip(scores[0], scores[0][1:]))

    # config-only pickling: the lazy client never ships
    import pickle

    state = pickle.loads(pickle.dumps(vs))
    assert state._client is None and state.location == ":memory:"
