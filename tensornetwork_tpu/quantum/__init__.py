from tensornetwork_tpu.quantum.quantum import (
    QuOperator, QuVector, QuAdjointVector, QuScalar, identity,
    quantum_constructor, check_spaces, eliminate_identities)
