"""Offline preprocessing tools: prior generation, alignment, conversion.

The reference's dn_splatter/scripts/ directory (~4.3k LoC) wraps
pretrained torch networks (Omnidata, DSINE, ZoeDepth) plus alignment and
consistency-mask math. The network inference stays an optional offline
torch path (the nets are NOT in the training loop, SURVEY.md section 2.2);
the math — scale/shift alignment, depth->normal, consistency masks — is
re-implemented natively here.
"""
