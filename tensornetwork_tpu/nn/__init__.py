from tensornetwork_tpu.nn.layers import (
    DenseDecomp, DenseMPO, DenseCondenser, DenseExpander, DenseEntangler,
    Conv2DMPO)
