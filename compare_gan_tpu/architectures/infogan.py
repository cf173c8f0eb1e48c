"""InfoGAN-style MLP+conv G/D for MNIST-scale experiments (rebuild of
compare_gan/architectures/infogan.py:35-100)."""

from __future__ import annotations

import jax

from compare_gan_tpu.architectures import abstract_arch
from compare_gan_tpu.ops import arch_ops as ops


class Generator(abstract_arch.AbstractGenerator):
    """InfoGAN generator (infogan.py:35-63)."""

    def apply(self, z, y, is_training):
        del y
        h, w, c = self._image_shape
        bs = z.shape[0]
        net = ops.linear(z, 1024, scope="g_fc1")
        net = ops.lrelu(ops.batch_norm(net, is_training=is_training,
                                       name="g_bn1"))
        net = ops.linear(net, 128 * (h // 4) * (w // 4), scope="g_fc2")
        net = ops.lrelu(ops.batch_norm(net, is_training=is_training,
                                       name="g_bn2"))
        net = net.reshape(bs, h // 4, w // 4, 128)
        net = ops.deconv2d(net, [bs, h // 2, w // 2, 64], 4, 4, 2, 2,
                           name="g_dc3")
        net = ops.lrelu(ops.batch_norm(net, is_training=is_training,
                                       name="g_bn3"))
        net = ops.deconv2d(net, [bs, h, w, c], 4, 4, 2, 2, name="g_dc4")
        return jax.nn.sigmoid(net)


class Discriminator(abstract_arch.AbstractDiscriminator):
    """InfoGAN discriminator (infogan.py:66-100)."""

    def apply(self, x, y, is_training):
        use_sn = self._spectral_norm
        bs = x.shape[0]
        net = ops.lrelu(ops.conv2d(x, 64, 4, 4, 2, 2, name="d_conv1",
                                   use_sn=use_sn))
        net = ops.conv2d(net, 128, 4, 4, 2, 2, name="d_conv2", use_sn=use_sn)
        net = self.batch_norm(net, y=y, is_training=is_training, name="d_bn2")
        net = ops.lrelu(net)
        net = net.reshape(bs, -1)
        net = ops.linear(net, 1024, scope="d_fc3", use_sn=use_sn)
        net = self.batch_norm(net, y=y, is_training=is_training, name="d_bn3")
        net = ops.lrelu(net)
        out_logit = ops.linear(net, 1, scope="d_fc4", use_sn=use_sn)
        return jax.nn.sigmoid(out_logit), out_logit, net
