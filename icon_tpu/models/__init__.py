"""Networks (reference L4), re-designed for XLA: flax.linen modules, NHWC
layout, static shapes. Weight-porting from the reference's torch checkpoints
is handled by icon_tpu.utils.torch_port."""
