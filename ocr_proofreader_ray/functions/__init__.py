"""Pure, Ray-free functions: the semantic core of every stage.

Each function here is a deterministic function of its inputs only, so every
distributed stage built on top is independent of batch boundaries, partition
order and parallelism level — the property that makes the pipeline's output
byte-identical across cluster sizes (BASELINE.json north_rule).
"""
