from .sage import SAGEConv, GraphSAGE, tree_neighbor_mean
from .hgt import HGT, HGTConv
from .node2vec import Node2Vec, make_node2vec_trainer
from .gnn import GAT, GATConv, GCN, GCNConv, GIN, GINConv
