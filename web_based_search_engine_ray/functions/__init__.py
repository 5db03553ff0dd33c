"""Pure (Ray-free) kernels: stemming, tokenization, text stats, hashing."""
