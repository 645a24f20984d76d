"""Thin Python client for the graft REST server.

Mirrors the reference's Python SDK surface (`client-sdk/Python/client.py`:
same method names, arguments, and error contract) over the standard library
only — no third-party HTTP dependency. Works against `graft.ServeMain` or any
server speaking the same wire protocol (route table and JSON shapes per the
reference's `internal/server/server.go` / `handlers.go`).

Usage:
    from graft_client import GraftClient
    with GraftClient("http://127.0.0.1:8080") as c:
        c.create_collection("docs", 4, index_type="flat")
        c.upsert_document("docs", "a", [1, 0, 0, 0])
        hits = c.search_vectors("docs", [1, 0, 0, 0], limit=5)
"""
from __future__ import annotations

import json
import urllib.error
import urllib.request
from typing import Any, Dict, List, Optional


class GraftError(RuntimeError):
    """Raised when the server returns a non-2xx status."""

    def __init__(self, status_code: int, message: Optional[str] = None):
        self.status_code = status_code
        self.message = message or ""
        super().__init__(f"HTTP {status_code}: {self.message}")


class GraftClient:
    def __init__(self, base_url: str = "http://127.0.0.1:8080",
                 timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    # -- plumbing --------------------------------------------------------

    def _request(self, method: str, path: str,
                 body: Optional[Dict[str, Any]] = None) -> Any:
        data = json.dumps(body).encode("utf-8") if body is not None else None
        req = urllib.request.Request(
            self.base_url + path, data=data, method=method,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                raw = resp.read()
                return json.loads(raw) if raw else None
        except urllib.error.HTTPError as e:
            raw = e.read()
            msg = None
            try:
                msg = json.loads(raw).get("error")
            except Exception:
                msg = raw.decode("utf-8", "replace") if raw else None
            raise GraftError(e.code, msg) from None

    # -- health ----------------------------------------------------------

    def health_check(self) -> bool:
        return self._request("GET", "/").get("status") == "ok"

    # -- collections -----------------------------------------------------

    def create_collection(self, name: str, dimension: int,
                          index_type: str = "hnsw", space_type: str = "l2",
                          parameters: Optional[Dict[str, Any]] = None
                          ) -> Dict[str, Any]:
        body: Dict[str, Any] = {"name": name, "dimension": dimension,
                                "index_type": index_type,
                                "space_type": space_type}
        if parameters:
            body["parameters"] = parameters
        return self._request("POST", "/v1/collections", body)

    def get_collection(self, name: str) -> Dict[str, Any]:
        return self._request("GET", f"/v1/collections/{name}")

    def list_collections(self) -> List[str]:
        return self._request("GET", "/v1/collections").get("collections", [])

    def delete_collection(self, name: str) -> None:
        self._request("DELETE", f"/v1/collections/{name}")

    # -- documents -------------------------------------------------------

    def upsert_document(self, collection: str, doc_id: str,
                        vector: List[float],
                        parameters: Optional[Dict[str, str]] = None
                        ) -> Dict[str, Any]:
        body: Dict[str, Any] = {"id": doc_id, "vector": vector}
        if parameters:
            body["parameters"] = parameters
        return self._request(
            "POST", f"/v1/collections/{collection}/documents", body)

    def batch_upsert_documents(self, collection: str,
                               documents: List[Dict[str, Any]]) -> None:
        self._request(
            "POST", f"/v1/collections/{collection}/documents/batchupsert",
            {"documents": documents})

    def get_document(self, collection: str, doc_id: str) -> Dict[str, Any]:
        return self._request(
            "GET", f"/v1/collections/{collection}/documents/{doc_id}")

    def delete_document(self, collection: str, doc_id: str) -> None:
        self._request(
            "DELETE", f"/v1/collections/{collection}/documents/{doc_id}")

    # -- index / params --------------------------------------------------

    def build_index(self, collection: str,
                    documents: Optional[List[Dict[str, Any]]] = None) -> None:
        body = {"documents": documents} if documents else {}
        self._request(
            "POST", f"/v1/collections/{collection}/buildindex", body)

    def set_params(self, collection: str, parameters: Dict[str, int]) -> None:
        self._request(
            "POST", f"/v1/collections/{collection}/documents/setparams",
            {"parameters": parameters})

    # -- search ----------------------------------------------------------

    def search_vectors(self, collection: str, vector: List[float],
                       limit: int = 10) -> Dict[str, List[Any]]:
        return self._request(
            "POST", f"/v1/collections/{collection}/vectors/search",
            {"vector": vector, "limit": limit})

    def search_documents(self, collection: str, vector: List[float],
                         limit: int = 10,
                         filter: Optional[Dict[str, str]] = None
                         ) -> Dict[str, Any]:
        body: Dict[str, Any] = {"vector": vector, "limit": limit}
        if filter:
            body["filter"] = filter
        return self._request(
            "POST", f"/v1/collections/{collection}/documents/search", body)

    # -- context manager -------------------------------------------------

    def close(self) -> None:  # nothing persistent to release (stdlib urllib)
        pass

    def __enter__(self) -> "GraftClient":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.close()
