package graft.queries

// (all groups implemented — file kept to anchor the package doc)
