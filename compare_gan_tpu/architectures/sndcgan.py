"""SN-DCGAN (rebuild of compare_gan/architectures/sndcgan.py:36-127;
Miyato et al., https://openreview.net/pdf?id=B1QRgziT-). G: 4 deconvs +
tanh; D: 7 convs, leak 0.1, input rescaled [0,1] -> [-1,1]."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from compare_gan_tpu.architectures import abstract_arch
from compare_gan_tpu.ops import arch_ops as ops


def conv_out_size_same(size, stride):
    return -(-size // stride)


class Generator(abstract_arch.AbstractGenerator):
    """SNDCGAN generator (sndcgan.py:36-81)."""

    def apply(self, z, y, is_training):
        bs = z.shape[0]
        s_h, s_w, colors = self._image_shape
        s_h2, s_w2 = conv_out_size_same(s_h, 2), conv_out_size_same(s_w, 2)
        s_h4, s_w4 = conv_out_size_same(s_h2, 2), conv_out_size_same(s_w2, 2)
        s_h8, s_w8 = conv_out_size_same(s_h4, 2), conv_out_size_same(s_w4, 2)

        net = ops.linear(z, s_h8 * s_w8 * 512, scope="g_fc1")
        net = self.batch_norm(net, z=z, y=y, is_training=is_training,
                              name="g_bn1")
        net = jax.nn.relu(net)
        net = net.reshape(bs, s_h8, s_w8, 512)
        net = ops.deconv2d(net, [bs, s_h4, s_w4, 256], 4, 4, 2, 2,
                           name="g_dc2")
        net = self.batch_norm(net, z=z, y=y, is_training=is_training,
                              name="g_bn2")
        net = jax.nn.relu(net)
        net = ops.deconv2d(net, [bs, s_h2, s_w2, 128], 4, 4, 2, 2,
                           name="g_dc3")
        net = self.batch_norm(net, z=z, y=y, is_training=is_training,
                              name="g_bn3")
        net = jax.nn.relu(net)
        net = ops.deconv2d(net, [bs, s_h, s_w, 64], 4, 4, 2, 2, name="g_dc4")
        net = self.batch_norm(net, z=z, y=y, is_training=is_training,
                              name="g_bn4")
        net = jax.nn.relu(net)
        net = ops.deconv2d(net, [bs, s_h, s_w, colors], 3, 3, 1, 1,
                           name="g_dc5")
        # [-1, 1] -> [0, 1] for consistency with other models.
        return (jnp.tanh(net) + 1.0) / 2.0


class Discriminator(abstract_arch.AbstractDiscriminator):
    """SNDCGAN discriminator (sndcgan.py:84-127)."""

    def apply(self, x, y, is_training):
        del is_training, y
        use_sn = self._spectral_norm
        # Preprocessing yields [0, 1]; the paper's D expects [-1, 1].
        x = x * 2.0 - 1.0
        net = ops.conv2d(x, 64, 3, 3, 1, 1, name="d_conv1", use_sn=use_sn)
        net = ops.lrelu(net, leak=0.1)
        net = ops.conv2d(net, 128, 4, 4, 2, 2, name="d_conv2", use_sn=use_sn)
        net = ops.lrelu(net, leak=0.1)
        net = ops.conv2d(net, 128, 3, 3, 1, 1, name="d_conv3", use_sn=use_sn)
        net = ops.lrelu(net, leak=0.1)
        net = ops.conv2d(net, 256, 4, 4, 2, 2, name="d_conv4", use_sn=use_sn)
        net = ops.lrelu(net, leak=0.1)
        net = ops.conv2d(net, 256, 3, 3, 1, 1, name="d_conv5", use_sn=use_sn)
        net = ops.lrelu(net, leak=0.1)
        net = ops.conv2d(net, 512, 4, 4, 2, 2, name="d_conv6", use_sn=use_sn)
        net = ops.lrelu(net, leak=0.1)
        net = ops.conv2d(net, 512, 3, 3, 1, 1, name="d_conv7", use_sn=use_sn)
        net = ops.lrelu(net, leak=0.1)
        net = net.reshape(x.shape[0], -1)
        out_logit = ops.linear(net, 1, scope="d_fc1", use_sn=use_sn)
        return jax.nn.sigmoid(out_logit), out_logit, net
