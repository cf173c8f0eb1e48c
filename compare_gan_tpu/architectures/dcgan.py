"""DCGAN generator and discriminator (rebuild of
compare_gan/architectures/dcgan.py:39-129; Radford et al. 2015,
arXiv:1511.06434). BatchNorm in G and D, ReLU in G (tanh output), LeakyReLU
in D; supports 28/32/64/128 px via ceil-div spatial schedule."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from compare_gan_tpu.architectures import abstract_arch
from compare_gan_tpu.ops import arch_ops as ops


def conv_out_size_same(size, stride):
    return -(-size // stride)


class Generator(abstract_arch.AbstractGenerator):
    """DCGAN generator (dcgan.py:39-82)."""

    def apply(self, z, y, is_training):
        gf_dim = 64
        s_h, s_w, colors = self._image_shape
        s_h2, s_w2 = conv_out_size_same(s_h, 2), conv_out_size_same(s_w, 2)
        s_h4, s_w4 = conv_out_size_same(s_h2, 2), conv_out_size_same(s_w2, 2)
        s_h8, s_w8 = conv_out_size_same(s_h4, 2), conv_out_size_same(s_w4, 2)
        s_h16, s_w16 = conv_out_size_same(s_h8, 2), conv_out_size_same(s_w8, 2)
        bs = z.shape[0]

        net = ops.linear(z, gf_dim * 8 * s_h16 * s_w16, scope="g_fc1")
        net = net.reshape(-1, s_h16, s_w16, gf_dim * 8)
        net = self.batch_norm(net, z=z, y=y, is_training=is_training,
                              name="g_bn1")
        net = jax.nn.relu(net)
        net = ops.deconv2d(net, [bs, s_h8, s_w8, gf_dim * 4], 5, 5, 2, 2,
                           name="g_dc1")
        net = self.batch_norm(net, z=z, y=y, is_training=is_training,
                              name="g_bn2")
        net = jax.nn.relu(net)
        net = ops.deconv2d(net, [bs, s_h4, s_w4, gf_dim * 2], 5, 5, 2, 2,
                           name="g_dc2")
        net = self.batch_norm(net, z=z, y=y, is_training=is_training,
                              name="g_bn3")
        net = jax.nn.relu(net)
        net = ops.deconv2d(net, [bs, s_h2, s_w2, gf_dim], 5, 5, 2, 2,
                           name="g_dc3")
        net = self.batch_norm(net, z=z, y=y, is_training=is_training,
                              name="g_bn4")
        net = jax.nn.relu(net)
        net = ops.deconv2d(net, [bs, s_h, s_w, colors], 5, 5, 2, 2,
                           name="g_dc4")
        return 0.5 * jnp.tanh(net) + 0.5


class Discriminator(abstract_arch.AbstractDiscriminator):
    """DCGAN discriminator (dcgan.py:85-129)."""

    def apply(self, x, y, is_training):
        bs = x.shape[0]
        df_dim = 64
        use_sn = self._spectral_norm
        net = ops.lrelu(ops.conv2d(x, df_dim, 5, 5, 2, 2, name="d_conv1",
                                   use_sn=use_sn))
        net = ops.conv2d(net, df_dim * 2, 5, 5, 2, 2, name="d_conv2",
                         use_sn=use_sn)
        net = self.batch_norm(net, y=y, is_training=is_training, name="d_bn1")
        net = ops.lrelu(net)
        net = ops.conv2d(net, df_dim * 4, 5, 5, 2, 2, name="d_conv3",
                         use_sn=use_sn)
        net = self.batch_norm(net, y=y, is_training=is_training, name="d_bn2")
        net = ops.lrelu(net)
        net = ops.conv2d(net, df_dim * 8, 5, 5, 2, 2, name="d_conv4",
                         use_sn=use_sn)
        net = self.batch_norm(net, y=y, is_training=is_training, name="d_bn3")
        net = ops.lrelu(net)
        out_logit = ops.linear(net.reshape(bs, -1), 1, scope="d_fc4",
                               use_sn=use_sn)
        return jax.nn.sigmoid(out_logit), out_logit, net
