#!/usr/bin/env python3
"""End-to-end exercise of the Python client against a live graft server —
replays the reference's `handlers_test.go:362-459` search scenario (create →
upsert → build → setparams → search both endpoints → filtered search →
delete), plus the malformed-body (400) and not-found (404) error contracts.

Usage: python3 tools/client_e2e.py <port>   (server: sbt 'runMain graft.ServeMain')
"""
import sys

sys.path.insert(0, "client/python")
from graft_client import GraftClient, GraftError  # noqa: E402


def expect(cond, msg):
    if not cond:
        print(f"FAIL: {msg}")
        sys.exit(1)
    print(f"  ok: {msg}")


def main(port):
    c = GraftClient(f"http://127.0.0.1:{port}")
    expect(c.health_check(), "health check")

    name = "e2e_py"
    c.create_collection(name, 4, index_type="flat", space_type="l2")
    # duplicate create → 200 with message, not an error (handlers.go:90-93)
    dup = c.create_collection(name, 4, index_type="flat")
    expect("exists" in str(dup.get("message", "")), "duplicate create is ok")
    expect(name in c.list_collections(), "collection listed")
    expect(c.get_collection(name)["dimension"] == 4, "get collection")

    c.upsert_document(name, "a", [1.0, 0.0, 0.0, 0.0], {"tag": "x"})
    c.batch_upsert_documents(name, [
        {"id": "b", "vector": [0.0, 1.0, 0.0, 0.0], "parameters": {"tag": "y"}},
        {"id": "d", "vector": [0.9, 0.1, 0.0, 0.0], "parameters": {"tag": "x"}},
    ])
    c.build_index(name, documents=[
        {"id": "e", "vector": [0.0, 0.0, 1.0, 0.0]}])  # buildindex body upserts
    expect(c.get_document(name, "a")["vector"][0] == 1.0, "get document")

    hits = c.search_vectors(name, [1.0, 0.0, 0.0, 0.0], limit=2)
    expect(hits["ids"][0] == "a", "vector search: self-match first")
    expect(len(hits["ids"]) == 2 and hits["distances"][0] == 0.0,
           "vector search shape")

    docs = c.search_documents(name, [1.0, 0.0, 0.0, 0.0], limit=3)
    expect(docs["documents"][0]["id"] == "a", "document search top hit")
    filtered = c.search_documents(name, [1.0, 0.0, 0.0, 0.0], limit=2,
                                  filter={"tag": "y"})
    expect([d["id"] for d in filtered["documents"]] == ["b"],
           "filtered search honors metadata predicate")

    c.delete_document(name, "a")
    try:
        c.get_document(name, "a")
        expect(False, "deleted doc reads absent")
    except GraftError as e:
        expect(e.status_code == 404, "deleted doc → 404")

    try:
        c._request("POST", f"/v1/collections/{name}/documents", {"id": "z"})
        expect(False, "missing vector field rejected")
    except GraftError as e:
        expect(e.status_code == 400, "missing body field → 400")

    try:
        c.get_collection("nope_does_not_exist")
        expect(False, "missing collection rejected")
    except GraftError as e:
        expect(e.status_code == 404, "missing collection → 404")

    # the beyond-reference quantized tiers speak the same wire protocol
    for qname, itype in [("e2e_opq", "opq"), ("e2e_sq", "sq"), ("e2e_bq", "bq")]:
        c.create_collection(qname, 4, index_type=itype, space_type="l2",
                            parameters={"m": "2"} if itype == "opq" else None)
        c.batch_upsert_documents(qname, [
            {"id": str(i), "vector": [float(i), float(i % 3), float((i * 7) % 5), 1.0]}
            for i in range(30)])
        c.build_index(qname)
        qhits = c.search_vectors(qname, [5.0, 2.0, 0.0, 1.0], limit=3)
        expect(qhits["ids"][0] == "5" and qhits["distances"][0] == 0.0,
               f"{itype} collection: quantized search self-match")
        c.delete_collection(qname)

    c.delete_collection(name)
    expect(name not in c.list_collections(), "collection deleted")
    print("== client e2e: all checks passed ==")


if __name__ == "__main__":
    main(sys.argv[1])
