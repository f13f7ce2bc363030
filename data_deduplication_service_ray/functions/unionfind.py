"""Local union-find (disjoint-set) with path compression + union by size.

Used by the small-scale clustering path (edges streamed to one holder) and
inside tests as the oracle for the distributed label-propagation path.
Labels are canonicalized to the minimum member id so cluster ids are
deterministic regardless of edge arrival order (SURVEY.md §7.4).
"""

from __future__ import annotations


class UnionFind:
    __slots__ = ("parent", "size")

    def __init__(self):
        self.parent: dict[int, int] = {}
        self.size: dict[int, int] = {}

    def find(self, x: int) -> int:
        parent = self.parent
        if x not in parent:
            parent[x] = x
            self.size[x] = 1
            return x
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:          # path compression
            parent[x], x = root, parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]

    def labels(self) -> dict[int, int]:
        """node -> min-id-of-component for every node ever seen."""
        roots: dict[int, int] = {}
        for x in self.parent:
            r = self.find(x)
            if r not in roots or x < roots[r]:
                roots[r] = x
        return {x: roots[self.find(x)] for x in self.parent}
