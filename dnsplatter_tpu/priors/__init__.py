"""Monocular-prior networks ported to JAX (inference).

DSINE surface-normal estimation (dn_splatter/scripts/dsine/, 740 LoC of
torch+geffnet in the reference) re-implemented as pure-functional JAX:
`efficientnet` (tf_efficientnet_b5_ap feature encoder), `dsine` (decoder
+ NRN iterative refinement), `convert` (torch checkpoint -> npz).
"""
