"""Model composition: layers, blocks, chains, flows, base distributions."""
