from .pallas_recon import fused_reconstruct
