"""Boundary correction for unique synteny block pairs (--correctboundaries).

Reference: Postprocessor::ImproveBlockBoundaries (src/postprocessor.cpp:
199-348): for each block with exactly one copy in the reference genome and
one in the assembly, locally align +/- correction-range flanks (score
25/-75/-75) and move both boundaries accordingly.

Implemented in a later phase together with the batched alignment kernel;
the entry point exists so the CLI surface is complete.
"""
from __future__ import annotations


def improve_block_boundaries(block_list, reference_chr_id, min_block_size: int = 5000):
    raise NotImplementedError(
        "--correctboundaries lands with the batched alignment engine "
        "(variants phase); see SURVEY.md build plan step 5")
