"""Minimal torch re-statements of the backbone pieces for numerical parity.

torchvision is not installed here, so these small torch modules restate the
well-known bottleneck/FPN topology (including the detectron2 stride_in_1x1
variant and FrozenBN) directly with torch.nn primitives, serving as an
independent oracle for padding/stride/upsampling geometry.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class TFrozenBN(nn.Module):
    def __init__(self, c, eps=1e-5):
        super().__init__()
        self.register_buffer("weight", torch.randn(c))
        self.register_buffer("bias", torch.randn(c))
        self.register_buffer("running_mean", torch.randn(c))
        self.register_buffer("running_var", torch.rand(c) + 0.5)
        self.eps = eps

    def forward(self, x):
        scale = self.weight / (self.running_var + self.eps).sqrt()
        shift = self.bias - self.running_mean * scale
        return x * scale[None, :, None, None] + shift[None, :, None, None]


class TConvNorm(nn.Module):
    def __init__(self, cin, cout, k, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=(k - 1) // 2, bias=False)
        self.bn = TFrozenBN(cout)

    def forward(self, x):
        return self.bn(self.conv(x))


class TBottleneck(nn.Module):
    def __init__(self, cin, mid, stride=1, stride_in_1x1=False, project=False):
        super().__init__()
        s1, s2 = (stride, 1) if stride_in_1x1 else (1, stride)
        self.conv1 = TConvNorm(cin, mid, 1, s1)
        self.conv2 = TConvNorm(mid, mid, 3, s2)
        self.conv3 = TConvNorm(mid, mid * 4, 1, 1)
        self.downsample = TConvNorm(cin, mid * 4, 1, stride) if project else None

    def forward(self, x):
        h = F.relu(self.conv1(x))
        h = F.relu(self.conv2(h))
        h = self.conv3(h)
        sc = self.downsample(x) if self.downsample is not None else x
        return F.relu(h + sc)


class TResNet(nn.Module):
    def __init__(self, stage_sizes, stride_in_1x1):
        super().__init__()
        self.stem = TConvNorm(3, 64, 7, 2)
        cin, mid = 64, 64
        self.stages = nn.ModuleList()
        for stage, blocks in enumerate(stage_sizes):
            stride = 1 if stage == 0 else 2
            layer = nn.ModuleList()
            for b in range(blocks):
                layer.append(
                    TBottleneck(cin, mid, stride if b == 0 else 1, stride_in_1x1, project=(b == 0))
                )
                cin = mid * 4
            self.stages.append(layer)
            mid *= 2

    def forward(self, x):
        h = F.relu(self.stem(x))
        h = F.max_pool2d(h, 3, stride=2, padding=1)
        outs = {}
        for i, layer in enumerate(self.stages):
            for block in layer:
                h = block(h)
            outs[str(i)] = h
        return outs


class TFPN(nn.Module):
    def __init__(self, in_channels, out_channels=256):
        super().__init__()
        self.inner = nn.ModuleList([nn.Conv2d(c, out_channels, 1) for c in in_channels])
        self.layer = nn.ModuleList([nn.Conv2d(out_channels, out_channels, 3, padding=1) for _ in in_channels])

    def forward(self, feats):
        keys = sorted(feats.keys(), key=int)
        laterals = [self.inner[i](feats[k]) for i, k in enumerate(keys)]
        merged = [None] * len(laterals)
        merged[-1] = laterals[-1]
        for i in range(len(laterals) - 2, -1, -1):
            up = F.interpolate(merged[i + 1], size=laterals[i].shape[-2:], mode="nearest")
            merged[i] = laterals[i] + up
        out = {k: self.layer[i](merged[i]) for i, k in enumerate(keys)}
        out["pool"] = F.max_pool2d(out[keys[-1]], 1, stride=2)
        return out
