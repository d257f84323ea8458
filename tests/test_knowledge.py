"""Knowledge base / RAG tests: Vietnamese NLP, stores, retrievers
(dense/BM25/hybrid/reranker), RAG fusion, KB utils."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivqa_tpu.knowledge import (Document, DocumentStore, HashingTextEncoder,
                                 DenseRetriever, HybridRetriever,
                                 InMemoryVectorStore, RAGFusion, RAGModule,
                                 RerankerRetriever, SparseRetriever,
                                 ascii_fold, chunk_text,
                                 create_knowledge_base_index,
                                 create_vector_store,
                                 deduplicate_by_similarity,
                                 detect_vietnamese, evaluate_retrieval,
                                 extract_keywords, format_knowledge_prompt,
                                 load_knowledge_base,
                                 normalize_vietnamese_text, retrieve_diverse,
                                 save_knowledge_base, similarity_matrix,
                                 split_sentences)

DOCS = [
    Document(content="con mèo là động vật nuôi phổ biến", category="animal"),
    Document(content="con chó trung thành với con người", category="animal"),
    Document(content="quả táo chứa nhiều vitamin", category="food"),
    Document(content="xe máy là phương tiện giao thông ở việt nam",
             category="vehicle"),
]


# -- Vietnamese NLP ----------------------------------------------------------

def test_normalize_and_fold():
    assert normalize_vietnamese_text("  Con   MÈO ") == "con mèo"
    assert ascii_fold("mèo đen") == "meo den"


def test_detect_vietnamese():
    assert detect_vietnamese("con mèo đen đang ngủ")
    assert not detect_vietnamese("the black cat sleeps")


def test_sentences_keywords_chunks():
    sents = split_sentences("Mèo ngủ. Chó chạy! Ai đó?")
    assert len(sents) == 3
    kws = extract_keywords("con mèo đen và con mèo trắng ngủ")
    assert "mèo" in kws
    chunks = chunk_text(" ".join(str(i) for i in range(100)), 30, 10)
    assert len(chunks) >= 4
    assert chunks[0].split()[-10:] == chunks[1].split()[:10]  # overlap


# -- stores -------------------------------------------------------------------

def test_document_store_indices_and_persistence(tmp_path):
    store = DocumentStore()
    store.add_many(DOCS)
    assert len(store) == 4
    assert len(store.by_category("animal")) == 2
    store.save(tmp_path / "docs.json")
    loaded = DocumentStore.load(tmp_path / "docs.json")
    assert len(loaded) == 4
    assert loaded.get(DOCS[0].doc_id).content == DOCS[0].content
    assert store.remove(DOCS[0].doc_id)
    assert len(store.by_category("animal")) == 1


def test_in_memory_vector_store_topk():
    store = InMemoryVectorStore()
    vecs = np.eye(4, dtype=np.float32)
    store.add(["a", "b", "c", "d"], vecs)
    ids, scores = store.search(np.array([[1, 0, 0, 0.1]], np.float32), 2)
    assert ids[0][0] == "a"
    assert scores[0][0] > scores[0][1]
    store.remove(["a"])
    ids, _ = store.search(np.array([[1, 0, 0, 0]], np.float32), 1)
    assert ids[0][0] != "a"


def test_vector_store_factory_fallback():
    # faiss is absent in this environment -> auto falls back to memory
    store = create_vector_store("auto", dim=8)
    assert isinstance(store, InMemoryVectorStore)
    with pytest.raises(ImportError):
        create_vector_store("faiss", dim=8)


# -- retrievers -----------------------------------------------------------------

def _dense():
    enc = HashingTextEncoder(dim=64)
    docs = DocumentStore()
    r = DenseRetriever(enc, InMemoryVectorStore(), docs)
    r.index(DOCS)
    return r


def test_dense_retriever():
    r = _dense()
    res = r.retrieve("con mèo ngủ", top_k=2)
    assert res[0].document.content.startswith("con mèo")


def test_sparse_bm25_retriever():
    r = SparseRetriever()
    r.index(DOCS)
    res = r.retrieve("vitamin trong quả táo", top_k=2)
    assert res and "táo" in res[0].document.content
    # term absent everywhere -> empty
    assert r.retrieve("zzzz", top_k=3) == []


def test_hybrid_retriever_both_fusions():
    for fusion in ("rrf", "linear"):
        h = HybridRetriever(_dense(), SparseRetriever(), fusion=fusion)
        h.sparse.index(DOCS)
        res = h.retrieve("con chó trung thành", top_k=2)
        assert res and "chó" in res[0].document.content, fusion


def test_reranker_retriever():
    r = RerankerRetriever(_dense(), candidates=4)
    res = r.retrieve("con mèo động vật nuôi", top_k=2)
    assert res[0].document.content.startswith("con mèo")
    assert res[0].score >= res[1].score


# -- RAG ------------------------------------------------------------------------

def test_rag_module_static_shapes():
    rag = RAGModule(_dense(), HashingTextEncoder(dim=64), num_retrieved=3)
    emb, mask, results = rag.retrieve_batch(["con mèo", "quả táo"])
    assert emb.shape == (2, 3, 64)
    assert mask.shape == (2, 3) and mask.sum() == 6
    assert len(results) == 2


def test_rag_fusion_strategies(rng):
    feats = jnp.ones((2, 32))
    ctx = jnp.ones((2, 3, 64))
    mask = jnp.array([[1, 1, 0], [1, 0, 0]], jnp.int32)
    for strategy in ("attention", "concat", "gated", "add"):
        m = RAGFusion(hidden_dim=32, strategy=strategy)
        var = m.init(rng, feats, ctx, mask)
        out = m.apply(var, feats, ctx, mask)
        assert out.shape == (2, 32), strategy
        assert np.isfinite(np.asarray(out, np.float32)).all()


# -- utils -------------------------------------------------------------------------

def test_kb_index_save_load_roundtrip(tmp_path):
    enc = HashingTextEncoder(dim=64)
    docs, vecs = create_knowledge_base_index(DOCS, enc)
    assert len(docs) == 4 and len(vecs) == 4
    save_knowledge_base(tmp_path / "kb", docs, vecs)
    d2, v2 = load_knowledge_base(tmp_path / "kb")
    assert len(d2) == 4 and len(v2) == 4
    r = DenseRetriever(enc, v2, d2)
    res = r.retrieve("quả táo chứa vitamin", 1)
    assert "táo" in res[0].document.content


def test_dedup_and_mmr():
    emb = np.array([[1, 0], [1, 0.01], [0, 1]], np.float32)
    docs = [Document(content=f"d{i}") for i in range(3)]
    kept = deduplicate_by_similarity(docs, emb, threshold=0.99)
    assert len(kept) == 2
    # MMR must prefer diversity over the near-duplicate
    sel = retrieve_diverse(np.array([1, 0.2], np.float32), emb, top_k=2,
                           lambda_mult=0.5)
    assert sel[0] in (0, 1) and sel[1] == 2


def test_cluster_documents_kmeans_and_hierarchical():
    """Three well-separated blobs must be recovered exactly by both
    methods (reference kb_utils.py:360-400 parity)."""
    from vivqa_tpu.knowledge import cluster_documents
    rng = np.random.RandomState(0)
    blobs = np.concatenate([
        rng.randn(10, 4) * 0.05 + c
        for c in (np.array([5, 0, 0, 0]), np.array([0, 5, 0, 0]),
                  np.array([0, 0, 5, 0]))]).astype(np.float32)
    for method in ("kmeans", "hierarchical"):
        labels, centers = cluster_documents(blobs, 3, method=method)
        assert labels.shape == (30,) and centers.shape == (3, 4)
        # each blob maps to exactly one cluster, all three distinct
        groups = [set(labels[i * 10:(i + 1) * 10]) for i in range(3)]
        assert all(len(g) == 1 for g in groups)
        assert len(set().union(*groups)) == 3
        # centers sit near the blob means
        for g, c in zip(groups, (5, 5, 5)):
            k = next(iter(g))
            assert np.linalg.norm(centers[k]) == pytest.approx(5.0, abs=0.2)
    with pytest.raises(ValueError):
        cluster_documents(blobs, 3, method="dbscan")


def test_retrieval_eval_and_prompt():
    r = _dense()
    stats = evaluate_retrieval(
        r, ["con mèo"], [{DOCS[0].doc_id}], k=2)
    assert stats["recall@2"] == 1.0 and stats["mrr"] == 1.0
    sims = similarity_matrix(np.eye(3, dtype=np.float32))
    np.testing.assert_allclose(np.diag(sims), 1.0, atol=1e-6)
    prompt = format_knowledge_prompt("mèo là gì?", DOCS[:2])
    assert "Câu hỏi" in prompt and "[2]" in prompt


def test_chroma_store_import_gated():
    """ChromaVectorStore exists for parity but raises a clear ImportError
    without chromadb; the factory never selects it on 'auto'."""
    import pytest
    from vivqa_tpu.knowledge import ChromaVectorStore, create_vector_store
    try:
        import chromadb  # noqa: F401
        has = True
    except ImportError:
        has = False
    if has:
        store = create_vector_store("chroma", dim=8)
        store.add(["a", "b"], np.eye(2, 8, dtype=np.float32))
        ids, _ = store.search(np.eye(1, 8, dtype=np.float32), top_k=1)
        assert ids[0][0] == "a"
    else:
        with pytest.raises(ImportError):
            ChromaVectorStore(dim=8)
        assert create_vector_store("auto", dim=8) is not None
