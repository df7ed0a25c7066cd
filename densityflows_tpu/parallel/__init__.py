"""Mesh/sharding utilities and distributed collectives."""
