from .datatypes import Alignment
from .seeding import MinimizerIndex, Chain, chain_anchors, find_chains

__all__ = ["Alignment", "MinimizerIndex", "Chain", "chain_anchors", "find_chains"]
