from .sage import SAGEConv, GraphSAGE, tree_neighbor_mean
from .hgt import HGT, HGTConv
