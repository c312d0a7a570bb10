"""The develop pipeline: the reference megakernel as one fused jit function,
plus the batch/sharded export driver."""
