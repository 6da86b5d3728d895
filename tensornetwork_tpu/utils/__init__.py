from tensornetwork_tpu.utils.serialization import save_nodes, load_nodes
from tensornetwork_tpu.utils.topology import from_topology
from tensornetwork_tpu.utils.visualization import to_graphviz
