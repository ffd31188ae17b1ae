from .svd_vae import SVDTemporalVAE, Encoder, TemporalDecoder, SVD_VAE_SCALING
