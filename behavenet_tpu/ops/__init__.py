"""TPU compute primitives: convs, pooling, losses, HMM message passing."""
