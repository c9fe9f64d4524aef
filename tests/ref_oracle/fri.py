"""Transliteration of reference `src/fri.rs` — the complete FRI prover and
verifier with the reference's exact algorithms and stream order, including
the per-element modular exponentiation in fold (fri.rs:70-88) and the
from-scratch Merkle tree rebuilds in the query phase (fri.rs:288-298).
"""

from .fiat_shamir import FiatShamir  # noqa: F401  (re-export convenience)
from .hashfn import Hash
from .merkle import MerkleTree
from .poly import Polynomial
from .stream import ProofObject


def test_colinearity(points, field):
    # fri.rs:507-525 — cross-multiplication check.
    if len(points) != 3:
        return False
    (x0, y0), (x1, y1), (x2, y2) = points
    dy1 = field.sub(y1, y0)
    dx1 = field.sub(x1, x0)
    dy2 = field.sub(y2, y0)
    dx2 = field.sub(x2, x0)
    return field.mul(dy1, dx2) == field.mul(dy2, dx1)


class Fri:
    """fri.rs:8-15, 29-505."""

    def __init__(self, omega, offset, domain_length, expansion_factor,
                 num_colinearity_tests):
        # fri.rs:30-55.
        assert domain_length & (domain_length - 1) == 0, (
            "Domain length must be power of 2"
        )
        assert expansion_factor & (expansion_factor - 1) == 0, (
            "Expansion factor must be power of 2"
        )
        assert expansion_factor >= 4, "Expansion factor must be at least 4"
        self.omega = omega
        self.offset = offset
        self.domain_length = domain_length
        self.field = omega.field
        self.expansion_factor = expansion_factor
        self.num_colinearity_tests = num_colinearity_tests

    def fold_codeword(self, codeword, alpha, offset, omega):
        # fri.rs:57-91 — per-element x = offset * omega^i via field.exp.
        f = self.field
        one = f.one()
        two_inv = f.inv(f.new_element(2))
        half = len(codeword) // 2
        folded = []
        for i in range(half):
            x = f.mul(offset, f.exp(omega, i))
            a = f.add(one, f.div(alpha, x))
            b = f.sub(one, f.div(alpha, x))
            term = f.add(f.mul(a, codeword[i]), f.mul(b, codeword[half + i]))
            folded.append(f.mul(two_inv, term))
        return folded

    def num_rounds(self):
        # fri.rs:93-103.
        codeword_length = self.domain_length
        n = 0
        while (codeword_length > self.expansion_factor
               and 4 * self.num_colinearity_tests < codeword_length):
            codeword_length //= 2
            n += 1
        return n

    def commit(self, initial_codeword, proof_stream, fiat_shamir):
        # fri.rs:105-156.
        codeword = list(initial_codeword)
        omega = self.omega
        offset = self.offset
        codewords = []
        rounds = self.num_rounds()
        for r in range(rounds):
            hashes = [Hash.from_field_elements([e.value]) for e in codeword]
            # Pad to next power of two with zero hashes (fri.rs:123-125).
            padded_len = 1 if not hashes else 1 << (len(hashes) - 1).bit_length()
            hashes = hashes + [Hash(b"\x00" * 32)] * (padded_len - len(hashes))
            tree = MerkleTree(hashes)
            root = tree.get_root()
            proof_stream.push(ProofObject.MerkleRoot(root))
            fiat_shamir.absorb(root.data)
            if r == rounds - 1:
                break
            alpha = fiat_shamir.challenge(self.field)
            codewords.append(list(codeword))
            codeword = self.fold_codeword(codeword, alpha, offset, omega)
            omega = self.field.mul(omega, omega)
            offset = self.field.mul(offset, offset)
        proof_stream.push(ProofObject.FieldElements(list(codeword)))
        codewords.append(list(codeword))
        return codewords

    def eval_domain(self, round):
        # fri.rs:158-166 — declared but unused by prove/verify.
        size = self.domain_length >> round
        return [
            self.field.mul(
                self.offset, self.field.exp(self.omega, (1 << round) * i)
            )
            for i in range(size)
        ]

    @staticmethod
    def sample_index(byte_array, size):
        # fri.rs:168-174 — fold bytes into a u128 accumulator.
        acc = 0
        for b in byte_array:
            acc = ((acc << 8) ^ b) & ((1 << 128) - 1)
        return acc % size

    def sample_indices(self, seed, size, reduced_size, number):
        # fri.rs:176-213.
        assert number <= 2 * reduced_size, (
            "not enough entropy in indices wrt last codeword"
        )
        assert number <= reduced_size, (
            "cannot sample more indices than available in last codeword; "
            f"requested: {number}, available: {reduced_size}"
        )
        indices = []
        reduced_indices = []
        counter = 0
        while len(indices) < number:
            h = Hash.from_bytes(bytes(seed) + counter.to_bytes(4, "little"))
            index = Fri.sample_index(h.data, size)
            reduced_index = index % reduced_size
            counter += 1
            if reduced_index not in reduced_indices:
                indices.append(index)
                reduced_indices.append(reduced_index)
        return indices

    def query(self, current_codeword, next_codeword, c_indices, proof_stream,
              current_tree, next_tree):
        # fri.rs:215-248.
        half = len(current_codeword) // 2
        a_indices = list(c_indices)
        b_indices = [i + half for i in a_indices]
        for s in range(self.num_colinearity_tests):
            triple = [
                current_codeword[a_indices[s]],
                current_codeword[b_indices[s]],
                next_codeword[c_indices[s]],
            ]
            proof_stream.push(ProofObject.FieldElements(triple))
        for s in range(self.num_colinearity_tests):
            proof_stream.push(ProofObject.MerklePath(current_tree.open(a_indices[s])))
            proof_stream.push(ProofObject.MerklePath(current_tree.open(b_indices[s])))
            proof_stream.push(ProofObject.MerklePath(next_tree.open(c_indices[s])))
        return a_indices + b_indices

    def prove(self, initial_codeword, fiat_shamir, proof_stream):
        # fri.rs:250-311.
        assert self.domain_length == len(initial_codeword), (
            "initial codeword length does not match domain length"
        )
        codewords = self.commit(initial_codeword, proof_stream, fiat_shamir)
        sample_size = (
            len(codewords[1]) if len(codewords) > 1 else len(codewords[0])
        )
        seed = Hash.from_u64(fiat_shamir.challenge(codewords[0][0].field).value)
        top_level_indices = self.sample_indices(
            seed.data, sample_size, len(codewords[-1]), self.num_colinearity_tests
        )
        indices = list(top_level_indices)
        for i in range(len(codewords) - 1):
            indices = [idx % (len(codewords[i]) // 2) for idx in indices]
            current_tree = MerkleTree(
                [Hash.from_field_elements([e.value]) for e in codewords[i]]
            )
            next_tree = MerkleTree(
                [Hash.from_field_elements([e.value]) for e in codewords[i + 1]]
            )
            self.query(codewords[i], codewords[i + 1], indices, proof_stream,
                       current_tree, next_tree)
        return top_level_indices

    def verify(self, proof_stream, fiat_shamir, polynomial_values):
        # fri.rs:313-504.
        f = self.field
        omega = self.omega
        offset = self.offset
        rounds = self.num_rounds()

        roots = []
        alphas = []
        for _ in range(rounds):
            obj = proof_stream.pop()
            if not isinstance(obj, ProofObject.MerkleRoot):
                return False
            roots.append(obj.payload)
            fiat_shamir.absorb(obj.payload.data)
            alphas.append(fiat_shamir.challenge(f))

        obj = proof_stream.pop()
        if not isinstance(obj, ProofObject.FieldElements):
            return False
        last_codeword = obj.payload

        if not roots:
            return False
        last_tree = MerkleTree(
            [Hash.from_field_elements([e.value]) for e in last_codeword]
        )
        if roots[-1] != last_tree.get_root():
            return False

        degree_bound = len(last_codeword) // self.expansion_factor
        if degree_bound == 0:
            return False
        degree = degree_bound - 1
        last_omega = omega
        last_offset = offset
        for _ in range(rounds - 1):
            last_omega = f.mul(last_omega, last_omega)
            last_offset = f.mul(last_offset, last_offset)

        last_domain = [
            f.mul(last_offset, f.exp(last_omega, i))
            for i in range(len(last_codeword))
        ]
        poly = Polynomial.interpolate_domain(last_domain, last_codeword)
        re_evaluated = poly.eval_domain(last_domain)
        for i, val in enumerate(last_codeword):
            if re_evaluated[i] != val:
                return False
        if poly.deg() > degree:
            return False

        top_level_indices = self.sample_indices(
            Hash.from_u64(fiat_shamir.challenge(f).value).data,
            self.domain_length >> 1,
            self.domain_length >> (rounds - 1),
            self.num_colinearity_tests,
        )

        for r in range(rounds - 1):
            c_indices = [
                idx % (self.domain_length >> (r + 1)) for idx in top_level_indices
            ]
            a_indices = list(c_indices)
            b_indices = [
                idx + (self.domain_length >> (r + 1)) for idx in a_indices
            ]

            aa, bb, cc = [], [], []
            for s in range(self.num_colinearity_tests):
                obj = proof_stream.pop()
                if not isinstance(obj, ProofObject.FieldElements):
                    return False
                triple = obj.payload
                if len(triple) != 3:
                    return False
                ay, by, cy = triple
                aa.append(ay)
                bb.append(by)
                cc.append(cy)
                if r == 0:
                    polynomial_values.append((a_indices[s], ay))
                    polynomial_values.append((b_indices[s], by))
                ax = f.mul(offset, f.exp(omega, a_indices[s]))
                bx = f.mul(offset, f.exp(omega, b_indices[s]))
                cx = alphas[r]
                if not test_colinearity([(ax, ay), (bx, by), (cx, cy)], f):
                    return False

            for i in range(self.num_colinearity_tests):
                for vals, idxs, root in (
                    (aa, a_indices, roots[r]),
                    (bb, b_indices, roots[r]),
                    (cc, c_indices, roots[r + 1]),
                ):
                    obj = proof_stream.pop()
                    if not isinstance(obj, ProofObject.MerklePath):
                        return False
                    leaf = Hash.from_field_elements([vals[i].value])
                    if not MerkleTree.verify(leaf, idxs[i], obj.payload, root):
                        return False

            omega = f.mul(omega, omega)
            offset = f.mul(offset, offset)
        return True
