"""Transliteration of reference `src/merkle.rs`."""

from .hashfn import Hash


class MerkleTree:
    """merkle.rs:3-97 — stores every level in `nodes`."""

    def __init__(self, leaves):
        # merkle.rs:11-38.
        assert len(leaves) > 0, "Cannot create tree from empty leaves"
        assert len(leaves) & (len(leaves) - 1) == 0, (
            "Number of leaves must be power of 2"
        )
        nodes = [list(leaves)]
        current_level = list(leaves)
        while len(current_level) > 1:
            next_level = [
                Hash.combine(current_level[i], current_level[i + 1])
                for i in range(0, len(current_level), 2)
            ]
            nodes.append(next_level)
            current_level = next_level
        self.leaves = list(leaves)
        self.nodes = nodes
        self.root = current_level[0]

    def get_root(self):
        return self.root

    @staticmethod
    def commit(leaves):
        # merkle.rs:44-65 — root-only duplicate of new().
        return MerkleTree(leaves).root

    def open(self, index):
        # merkle.rs:67-80 — sibling path, index-halving walk.
        assert index < len(self.leaves), "Index out of bounds"
        proof = []
        idx = index
        for level in range(len(self.nodes) - 1):
            sibling_idx = idx + 1 if idx % 2 == 0 else idx - 1
            proof.append(self.nodes[level][sibling_idx])
            idx //= 2
        return proof

    @staticmethod
    def verify(leaf, index, proof, root):
        # merkle.rs:82-96 — refold by index parity.
        current = leaf
        idx = index
        for sibling in proof:
            if idx % 2 == 0:
                current = Hash.combine(current, sibling)
            else:
                current = Hash.combine(sibling, current)
            idx //= 2
        return current == root
