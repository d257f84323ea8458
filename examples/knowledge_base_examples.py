"""Knowledge base / RAG demo (reference: examples/knowledge_base_examples.py)."""

# allow running straight from a source checkout
import pathlib
import sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


from vivqa_tpu.knowledge import (Document, DocumentStore, DenseRetriever,
                                 HashingTextEncoder, HybridRetriever,
                                 InMemoryVectorStore, RAGModule,
                                 SparseRetriever, evaluate_retrieval,
                                 extract_keywords, format_knowledge_prompt,
                                 normalize_vietnamese_text)


def main():
    docs = [Document(content=c) for c in (
        "con mèo là động vật nuôi thích ngủ và bắt chuột",
        "con chó trung thành và thích chạy trong công viên",
        "quả táo màu đỏ chứa nhiều vitamin tốt cho sức khỏe",
        "xe máy là phương tiện giao thông phổ biến ở việt nam",
        "hà nội là thủ đô của việt nam với hồ gươm nổi tiếng")]

    enc = HashingTextEncoder(dim=128)
    dense = DenseRetriever(enc, InMemoryVectorStore(), DocumentStore())
    sparse = SparseRetriever()
    hybrid = HybridRetriever(dense, sparse, fusion="rrf")
    hybrid.index(docs)

    for q in ("thủ đô việt nam ở đâu?", "con gì thích bắt chuột?"):
        res = hybrid.retrieve(q, top_k=2)
        print(f"Q: {q}")
        for r in res:
            print(f"   [{r.score:.3f}] {r.document.content}")

    print("\nkeywords:", extract_keywords(docs[0].content))
    print("normalized:", normalize_vietnamese_text("  Hà   NỘI  "))

    rag = RAGModule(hybrid, enc, num_retrieved=3)
    emb, mask, _ = rag.retrieve_batch(["con mèo thích gì?"])
    print("\nRAG context tensor:", emb.shape, "mask:", mask.tolist())
    print("\nprompt:\n" + format_knowledge_prompt("con mèo thích gì?",
                                                  docs[:2]))
    print("\nretrieval quality:",
          evaluate_retrieval(hybrid, ["con mèo thích gì?"],
                             [{docs[0].doc_id}], k=3))


if __name__ == "__main__":
    main()
