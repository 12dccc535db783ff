"""10-shot PWD-Net adapter training."""
