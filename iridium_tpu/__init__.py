"""iridium_tpu: a TPU-native (JAX/XLA/Pallas) Iridium L-band burst receiver.

A from-scratch reimplementation of the capabilities of
alphafox02/iridium-sniffer, redesigned block-synchronous and batched for
TPU: windowed-FFT burst detection runs as a batched FFT + on-device scan,
per-burst downmix/demod run batched over padded burst tables, and protocol
decoding runs as vectorized GF(2) math. See SURVEY.md for the layer map.
"""

__version__ = "0.1.0"
