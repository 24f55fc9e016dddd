"""peppan_tpu — a TPU-native bacterial pan-genome engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of PEPPAN
(github.com/zheminzhou/PEPPAN; Zhou, Charlesworth & Achtman, Genome Research
30:1667-1679, 2020).  The reference pipeline orchestrates external C++
binaries (MMseqs2, BLASTn, DIAMOND, RapidNJ) via subprocesses; this framework
replaces that compute path with on-device kernels:

- k-mer minimizer sketching + MXU k-mer-profile prefilter for candidate pairs
- a banded Smith-Waterman / seed-extend Pallas kernel (VPU anti-diagonal
  wavefront) for exact gene-vs-gene and gene-vs-genome alignment
- a sharded genomes-by-genes similarity tile engine over a
  ``jax.sharding.Mesh`` with ('data', 'db') axes
- batched on-device neighbour-joining for phylogeny-aware paralog splitting
- host-side deterministic greedy ortholog assignment mirroring PEPPAN's
  ``filt_genes`` semantics (reference: PEPPA.py::filt_genes — mount empty at
  build time, semantics per SURVEY.md §3.3)

Layer map (ours):
  io/          GFF3+FASTA <-> packed int8 token arrays; output writers
  ops/         jittable compute ops + Pallas kernels
  parallel/    mesh setup, shardings, the all-vs-all tile engine
  cluster/     linclust-equivalent clustering, NJ, paralog splitting
  assign/      greedy ortholog assignment, synteny, pseudogene calling
  postprocess/ gene_content matrix, core alignment, rarefaction, trees
  utils/       logging, manifest/resume, profiling counters
"""

__version__ = "0.1.0"
