"""NanoReviser-TPU: a TPU-native nanopore basecall revision framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
pkubioinformatics/NanoReviser (reference layout documented in SURVEY.md):

- ``io``       host-side ingestion (fast5/HDF5), bit-exact fasta/fastq emission
- ``signal``   vectorized event decode + MAD-normalized signal windowing
- ``models``   functional JAX reviser models (conv residual + stacked Bi-LSTM)
- ``ops``      Pallas TPU kernels for the hot ops
- ``align``    training-label alignment (JAX banded Smith-Waterman; GraphMap oracle)
- ``train``    losses, Adam training step, DP over a device mesh, checkpointing
- ``infer``    batched window inference + revision merge
- ``parallel`` mesh/sharding utilities
- ``cli``      reference-compatible command-line drivers
"""

__version__ = "0.1.0"
