"""Baseline NeRF models for benchmark comparisons.

Parity: dn_splatter/eval/baseline_models/ — g_nerfacto (RGB),
g_depthnerfacto (RGB-D), g_neusfacto (NeuS SDF with RGB+D+N supervision),
the nerfstudio models the reference evaluates DN-Splatter against.
Re-implemented as compact JAX ray-marching models over a multiresolution
hash field.
"""
