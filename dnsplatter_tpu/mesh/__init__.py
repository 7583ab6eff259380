"""Mesh extraction: TSDF fusion, isosurfacing, density level sets."""
