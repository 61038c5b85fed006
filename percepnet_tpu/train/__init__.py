from percepnet_tpu.train.loss import percepnet_loss  # noqa: F401
