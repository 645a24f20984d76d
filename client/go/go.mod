module graft.dev/client

go 1.21
