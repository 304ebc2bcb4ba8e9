from phyml_tpu.io.alignment import Alignment, read_alignment
from phyml_tpu.io.newick import parse_newick, write_newick
