// Command e2e replays the Python client's live-wire checks through the Go
// client against a running graft server (same scenario as
// tools/client_e2e.py): collection DDL, document CRUD, buildindex, setparams
// validation, vector + document search, filter, and error contracts.
//
// Usage: go run ./e2e <base-url>
package main

import (
	"errors"
	"fmt"
	"math"
	"os"

	graft "graft.dev/client"
)

func check(name string, cond bool) {
	if cond {
		fmt.Printf("PASS %s\n", name)
	} else {
		fmt.Printf("FAIL %s\n", name)
		os.Exit(1)
	}
}

func apiStatus(err error) int {
	var apiErr *graft.APIError
	if errors.As(err, &apiErr) {
		return apiErr.Status
	}
	return -1
}

func main() {
	base := "http://127.0.0.1:8080"
	if len(os.Args) > 1 {
		base = os.Args[1]
	}
	c := graft.NewClient(base)

	ok, err := c.HealthCheck()
	check("health", err == nil && ok)

	_ = c.DeleteCollection("go_e2e") // clean slate; 404 is fine
	check("create collection", c.CreateCollection("go_e2e", 3, "flat", "l2", nil) == nil)
	check("duplicate create is 200", c.CreateCollection("go_e2e", 3, "flat", "l2", nil) == nil)

	info, err := c.GetCollection("go_e2e")
	check("get collection", err == nil && info.Dimension == 3)
	names, err := c.ListCollections()
	found := false
	for _, n := range names {
		if n == "go_e2e" {
			found = true
		}
	}
	check("list collections", err == nil && found)

	check("upsert", c.UpsertDocument("go_e2e", "1", []float32{1, 2, 3},
		map[string]string{"tag": "a"}) == nil)
	check("batch upsert", c.BatchUpsertDocuments("go_e2e", []graft.Document{
		{ID: "2", Vector: []float32{4, 5, 6}, Parameters: map[string]string{"tag": "b"}},
		{ID: "3", Vector: []float32{7, 8, 9}},
	}) == nil)
	badDim := c.UpsertDocument("go_e2e", "bad", []float32{1, 2}, nil)
	check("wrong dimension is 400", apiStatus(badDim) == 400)

	doc, err := c.GetDocument("go_e2e", "1")
	check("get document", err == nil && doc.ID == "1" && doc.Parameters["tag"] == "a")

	check("build index", c.BuildIndex("go_e2e", nil) == nil)
	badParam := c.SetParams("go_e2e", map[string]int{"efsearch": 10})
	check("efsearch invalid for flat is 400", apiStatus(badParam) == 400)

	res, err := c.SearchVectors("go_e2e", []float32{1, 2, 3}, 2)
	check("vector search", err == nil && len(res.IDs) == 2 && res.IDs[0] == "1" &&
		math.Abs(res.Distances[0]) < 1e-9 && math.Abs(res.Distances[1]-27) < 1e-9)

	dres, err := c.SearchDocuments("go_e2e", []float32{1, 2, 3}, 2,
		map[string]string{"tag": "b"})
	check("filtered document search", err == nil && len(dres.Documents) == 1 &&
		dres.Documents[0].ID == "2")

	check("delete document", c.DeleteDocument("go_e2e", "1") == nil)
	_, err = c.GetDocument("go_e2e", "1")
	check("deleted doc reads absent (404)", apiStatus(err) == 404)

	check("drop collection", c.DeleteCollection("go_e2e") == nil)
	_, err = c.GetCollection("go_e2e")
	check("dropped collection is 404", apiStatus(err) == 404)

	fmt.Println("ALL GO CLIENT CHECKS PASSED")
}
