// Package graft is a thin Go client for the graft REST server.
//
// Mirrors the reference's Go SDK surface (client-sdk/Go/client.go: same
// method set and error contract) over the standard library only, with typed
// request/response structs instead of raw maps. Works against graft.ServeMain
// or any server speaking the same wire protocol (route table and JSON shapes
// per the reference's internal/server/server.go / handlers.go).
//
// Usage:
//
//	c := graft.NewClient("http://127.0.0.1:8080")
//	if err := c.CreateCollection("docs", 4, "flat", "l2", nil); err != nil { ... }
//	if err := c.UpsertDocument("docs", "a", []float32{1, 0, 0, 0}, nil); err != nil { ... }
//	res, err := c.SearchVectors("docs", []float32{1, 0, 0, 0}, 5)
package graft

import (
	"bytes"
	"encoding/json"
	"fmt"
	"io"
	"net/http"
	"strings"
	"time"
)

// APIError is returned when the server replies with a non-2xx status.
type APIError struct {
	Status  int
	Message string
}

func (e *APIError) Error() string {
	return fmt.Sprintf("HTTP %d: %s", e.Status, e.Message)
}

// Client talks to one graft server. Safe for concurrent use.
type Client struct {
	BaseURL string
	HTTP    *http.Client
}

// NewClient returns a client with a 30s request timeout.
func NewClient(baseURL string) *Client {
	return &Client{
		BaseURL: strings.TrimRight(baseURL, "/"),
		HTTP:    &http.Client{Timeout: 30 * time.Second},
	}
}

// do sends one JSON request; non-2xx becomes *APIError (message taken from
// the server's {"error": ...} payload when present). A nil out skips
// decoding; an empty body decodes to nothing.
func (c *Client) do(method, path string, in, out any) error {
	var body io.Reader
	if in != nil {
		raw, err := json.Marshal(in)
		if err != nil {
			return err
		}
		body = bytes.NewReader(raw)
	}
	req, err := http.NewRequest(method, c.BaseURL+path, body)
	if err != nil {
		return err
	}
	req.Header.Set("Content-Type", "application/json")
	resp, err := c.HTTP.Do(req)
	if err != nil {
		return err
	}
	defer resp.Body.Close()
	raw, err := io.ReadAll(resp.Body)
	if err != nil {
		return err
	}
	if resp.StatusCode < 200 || resp.StatusCode > 299 {
		var e struct {
			Error string `json:"error"`
		}
		msg := string(raw)
		if json.Unmarshal(raw, &e) == nil && e.Error != "" {
			msg = e.Error
		}
		return &APIError{Status: resp.StatusCode, Message: msg}
	}
	if out == nil || len(raw) == 0 {
		return nil
	}
	return json.Unmarshal(raw, out)
}

// Document is the wire shape of one document.
type Document struct {
	ID         string            `json:"id"`
	Vector     []float32         `json:"vector"`
	Parameters map[string]string `json:"parameters,omitempty"`
}

// Collection is the wire shape of a create-collection request.
type Collection struct {
	Name       string            `json:"name"`
	Dimension  int               `json:"dimension"`
	IndexType  string            `json:"index_type"`
	SpaceType  string            `json:"space_type"`
	Parameters map[string]string `json:"parameters,omitempty"`
}

// CollectionInfo is the wire shape of a get-collection response (index and
// space type live in the metadata map, mirroring the server's reply).
type CollectionInfo struct {
	Name      string            `json:"name"`
	Dimension int               `json:"dimension"`
	Metadata  map[string]string `json:"metadata"`
}

// SearchResult holds vector-search hits (parallel slices, rank order).
type SearchResult struct {
	IDs       []string  `json:"ids"`
	Distances []float64 `json:"distances"`
}

// DocumentSearchResult holds document-search hits with metadata.
type DocumentSearchResult struct {
	Documents []Document `json:"documents"`
	Distances []float64  `json:"distances"`
}

// HealthCheck reports whether GET / answers {"status":"ok"}.
func (c *Client) HealthCheck() (bool, error) {
	var out struct {
		Status string `json:"status"`
	}
	if err := c.do("GET", "/", nil, &out); err != nil {
		return false, err
	}
	return out.Status == "ok", nil
}

// CreateCollection creates a collection (duplicate names are a 200 with a
// message, matching the server's duplicate-create contract).
func (c *Client) CreateCollection(name string, dimension int, indexType, spaceType string, parameters map[string]string) error {
	body := Collection{Name: name, Dimension: dimension, IndexType: indexType,
		SpaceType: spaceType, Parameters: parameters}
	return c.do("POST", "/v1/collections", body, nil)
}

// GetCollection fetches one collection's config (404 → *APIError).
func (c *Client) GetCollection(name string) (*CollectionInfo, error) {
	var out CollectionInfo
	if err := c.do("GET", "/v1/collections/"+name, nil, &out); err != nil {
		return nil, err
	}
	return &out, nil
}

// ListCollections returns all collection names.
func (c *Client) ListCollections() ([]string, error) {
	var out struct {
		Collections []string `json:"collections"`
	}
	if err := c.do("GET", "/v1/collections", nil, &out); err != nil {
		return nil, err
	}
	return out.Collections, nil
}

// DeleteCollection drops a collection.
func (c *Client) DeleteCollection(name string) error {
	return c.do("DELETE", "/v1/collections/"+name, nil, nil)
}

// UpsertDocument writes one document.
func (c *Client) UpsertDocument(collection, docID string, vector []float32, parameters map[string]string) error {
	body := Document{ID: docID, Vector: vector, Parameters: parameters}
	return c.do("POST", "/v1/collections/"+collection+"/documents", body, nil)
}

// BatchUpsertDocuments writes a batch atomically (all-or-nothing dimension
// validation server-side).
func (c *Client) BatchUpsertDocuments(collection string, documents []Document) error {
	body := map[string]any{"documents": documents}
	return c.do("POST", "/v1/collections/"+collection+"/documents/batchupsert", body, nil)
}

// GetDocument reads one document; deleted/absent ids are a 404 *APIError.
func (c *Client) GetDocument(collection, docID string) (*Document, error) {
	var out Document
	if err := c.do("GET", "/v1/collections/"+collection+"/documents/"+docID, nil, &out); err != nil {
		return nil, err
	}
	return &out, nil
}

// DeleteDocument tombstones one document.
func (c *Client) DeleteDocument(collection, docID string) error {
	return c.do("DELETE", "/v1/collections/"+collection+"/documents/"+docID, nil, nil)
}

// BuildIndex trains the collection's index (the server actually trains,
// unlike the reference's batch-upsert quirk); optional documents are
// upserted first.
func (c *Client) BuildIndex(collection string, documents []Document) error {
	body := map[string]any{}
	if len(documents) > 0 {
		body["documents"] = documents
	}
	return c.do("POST", "/v1/collections/"+collection+"/buildindex", body, nil)
}

// SetParams sets runtime search params (efsearch / nprobe; invalid keys or
// values are a 400 *APIError).
func (c *Client) SetParams(collection string, parameters map[string]int) error {
	body := map[string]any{"parameters": parameters}
	return c.do("POST", "/v1/collections/"+collection+"/documents/setparams", body, nil)
}

// SearchVectors returns the top-limit ids+distances for one query vector.
func (c *Client) SearchVectors(collection string, vector []float32, limit int) (*SearchResult, error) {
	body := map[string]any{"vector": vector, "limit": limit}
	var out SearchResult
	if err := c.do("POST", "/v1/collections/"+collection+"/vectors/search", body, &out); err != nil {
		return nil, err
	}
	return &out, nil
}

// SearchDocuments returns top-limit documents (with metadata) for one query
// vector; filter is an equality predicate over document parameters. Zero
// hits are a 404 *APIError ("no satisfied results found").
func (c *Client) SearchDocuments(collection string, vector []float32, limit int, filter map[string]string) (*DocumentSearchResult, error) {
	body := map[string]any{"vector": vector, "limit": limit}
	if len(filter) > 0 {
		body["filter"] = filter
	}
	var out DocumentSearchResult
	if err := c.do("POST", "/v1/collections/"+collection+"/documents/search", body, &out); err != nil {
		return nil, err
	}
	return &out, nil
}
