"""Pure-torch transcriptions of the two external model graphs the
reference consumes through pip packages, used as numerical forward oracles
(VERDICT round-2 item 3: neither ultralytics nor torchreid/boxmot is
installable in this environment, but torch is).

- :class:`YoloV8Torch` -- the ultralytics YOLOv8 detection graph
  (reference call sites coordinate_model.py:54-57,567: Conv(+BN eps 1e-3,
  SiLU), C2f, SPPF, PAN-FPN neck, decoupled Detect head with DFL box
  decode).  Module numbering model.0..model.22 matches the ultralytics
  state_dict layout so :func:`eagle_tpu.models.yolov8.yolov8_from_torch`
  consumes ``.state_dict()`` directly.
- :class:`OSNetTorch` -- the torchreid OSNet graph (Zhou et al. ICCV'19;
  reference ReID weights osnet_x0_25_msmt17.pt, coordinate_model.py:69),
  with torchreid attribute names (conv1, conv2..4 stacks, conv5, fc) so
  :func:`eagle_tpu.models.osnet.osnet_from_torch` consumes
  ``.state_dict()`` directly.

These are transcriptions of the published architectures, not copies of
either package's code.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

# ---------------------------------------------------------------------------
# YOLOv8 (ultralytics graph)
# ---------------------------------------------------------------------------

REG_MAX = 16
STRIDES = (8, 16, 32)

#: (depth, width, max_channels) per ultralytics yolov8 scale table
YOLO_SCALES = {
    "n": (1 / 3, 0.25, 1024),
    "s": (1 / 3, 0.50, 1024),
    "m": (2 / 3, 0.75, 768),
    "l": (1.0, 1.00, 512),
    "x": (1.0, 1.25, 512),
}


class UConv(nn.Module):
    """ultralytics Conv: Conv2d(no bias) + BatchNorm2d(eps=1e-3) + SiLU."""

    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3)

    def forward(self, x):
        return F.silu(self.bn(self.conv(x)))


class UBottleneck(nn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = UConv(c, c, 3)
        self.cv2 = UConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class UC2f(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = UConv(c1, 2 * self.c, 1)
        self.cv2 = UConv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(UBottleneck(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class USPPF(nn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = UConv(c1, c_, 1)
        self.cv2 = UConv(c_ * 4, c2, 1)

    def forward(self, x):
        y = [self.cv1(x)]
        for _ in range(3):
            y.append(F.max_pool2d(y[-1], 5, 1, 2))
        return self.cv2(torch.cat(y, 1))


class UDetect(nn.Module):
    """Anchor-free decoupled head: cv2=box (4*reg_max), cv3=cls; DFL
    softmax-expectation decode to xyxy pixel boxes."""

    def __init__(self, nc, ch):
        super().__init__()
        self.nc = nc
        c2 = max(16, ch[0] // 4, REG_MAX * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(UConv(c, c2, 3), UConv(c2, c2, 3), nn.Conv2d(c2, 4 * REG_MAX, 1))
            for c in ch
        )
        self.cv3 = nn.ModuleList(
            nn.Sequential(UConv(c, c3, 3), UConv(c3, c3, 3), nn.Conv2d(c3, nc, 1))
            for c in ch
        )
        # the (frozen, arange-weight) DFL conv that ultralytics serializes
        self.dfl = nn.Module()
        self.dfl.conv = nn.Conv2d(REG_MAX, 1, 1, bias=False)
        with torch.no_grad():
            self.dfl.conv.weight.copy_(
                torch.arange(REG_MAX, dtype=torch.float32).view(1, REG_MAX, 1, 1)
            )

    def forward(self, feats):
        boxes_all, scores_all = [], []
        for i, f in enumerate(feats):
            b, c = self.cv2[i](f), self.cv3[i](f)
            n, _, h, w = b.shape
            a = h * w
            dist = b.view(n, 4, REG_MAX, a).softmax(2)
            dist = (dist * torch.arange(REG_MAX, dtype=torch.float32).view(1, 1, REG_MAX, 1)).sum(2)
            sx = torch.arange(w, dtype=torch.float32) + 0.5
            sy = torch.arange(h, dtype=torch.float32) + 0.5
            gy, gx = torch.meshgrid(sy, sx, indexing="ij")
            anchors = torch.stack([gx.reshape(-1), gy.reshape(-1)], 0)  # (2, a)
            lt, rb = dist[:, :2], dist[:, 2:]
            x1y1 = (anchors[None] - lt) * STRIDES[i]
            x2y2 = (anchors[None] + rb) * STRIDES[i]
            boxes_all.append(torch.cat([x1y1, x2y2], 1).permute(0, 2, 1))  # (n, a, 4)
            scores_all.append(c.view(n, self.nc, a).permute(0, 2, 1).sigmoid())
        return torch.cat(boxes_all, 1), torch.cat(scores_all, 1)


class YoloV8Torch(nn.Module):
    """state_dict layout model.0 .. model.22, forward graph per the
    ultralytics yolov8 yaml (backbone saves P3/P4/P5, PAN-FPN neck)."""

    def __init__(self, variant="n", nc=5):
        super().__init__()
        d, wm, max_ch = YOLO_SCALES[variant]

        def ch(c):
            return int(math.ceil(min(c, max_ch) * wm / 8) * 8)

        def nd(x):
            return max(1, round(x * d))

        c5 = ch(1024)
        self.model = nn.ModuleList(
            [
                UConv(3, ch(64), 3, 2),  # 0
                UConv(ch(64), ch(128), 3, 2),  # 1
                UC2f(ch(128), ch(128), nd(3), True),  # 2
                UConv(ch(128), ch(256), 3, 2),  # 3
                UC2f(ch(256), ch(256), nd(6), True),  # 4  -> P3
                UConv(ch(256), ch(512), 3, 2),  # 5
                UC2f(ch(512), ch(512), nd(6), True),  # 6  -> P4
                UConv(ch(512), c5, 3, 2),  # 7
                UC2f(c5, c5, nd(3), True),  # 8
                USPPF(c5, c5),  # 9  -> P5
                nn.Upsample(scale_factor=2, mode="nearest"),  # 10
                nn.Identity(),  # 11 (Concat)
                UC2f(c5 + ch(512), ch(512), nd(3)),  # 12
                nn.Upsample(scale_factor=2, mode="nearest"),  # 13
                nn.Identity(),  # 14 (Concat)
                UC2f(ch(512) + ch(256), ch(256), nd(3)),  # 15 -> out P3
                UConv(ch(256), ch(256), 3, 2),  # 16
                nn.Identity(),  # 17 (Concat)
                UC2f(ch(256) + ch(512), ch(512), nd(3)),  # 18 -> out P4
                UConv(ch(512), ch(512), 3, 2),  # 19
                nn.Identity(),  # 20 (Concat)
                UC2f(ch(512) + c5, c5, nd(3)),  # 21 -> out P5
                UDetect(nc, (ch(256), ch(512), c5)),  # 22
            ]
        )

    def forward(self, x):
        m = self.model
        x = m[1](m[0](x))
        x = m[2](x)
        p3 = m[4](m[3](x))
        p4 = m[6](m[5](p3))
        x = m[8](m[7](p4))
        p5 = m[9](x)
        t1 = m[12](torch.cat([m[10](p5), p4], 1))
        o3 = m[15](torch.cat([m[13](t1), p3], 1))
        o4 = m[18](torch.cat([m[16](o3), t1], 1))
        o5 = m[21](torch.cat([m[19](o4), p5], 1))
        return m[22]([o3, o4, o5])


# ---------------------------------------------------------------------------
# OSNet (torchreid graph)
# ---------------------------------------------------------------------------

OSNET_VARIANTS = {
    "x1_0": (64, 256, 384, 512),
    "x0_25": (16, 64, 96, 128),
}


class TConv(nn.Module):
    """torchreid ConvLayer / Conv1x1 / Conv1x1Linear: conv(no bias) + BN
    (+ optional relu)."""

    def __init__(self, c1, c2, k=1, s=1, p=0, relu=True):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, p, bias=False)
        self.bn = nn.BatchNorm2d(c2)
        self.relu = relu

    def forward(self, x):
        y = self.bn(self.conv(x))
        return F.relu(y) if self.relu else y


class TLightConv3x3(nn.Module):
    """1x1 pointwise + 3x3 depthwise + BN + relu."""

    def __init__(self, c1, c2):
        super().__init__()
        self.conv1 = nn.Conv2d(c1, c2, 1, bias=False)
        self.conv2 = nn.Conv2d(c2, c2, 3, 1, 1, groups=c2, bias=False)
        self.bn = nn.BatchNorm2d(c2)

    def forward(self, x):
        return F.relu(self.bn(self.conv2(self.conv1(x))))


class TChannelGate(nn.Module):
    def __init__(self, c, reduction=16):
        super().__init__()
        r = max(1, c // reduction)
        self.fc1 = nn.Conv2d(c, r, 1, bias=True)
        self.fc2 = nn.Conv2d(r, c, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.sigmoid(self.fc2(F.relu(self.fc1(s))))
        return x * s


class TOSBlock(nn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        mid = c2 // 4
        self.conv1 = TConv(c1, mid, relu=True)
        self.conv2a = TLightConv3x3(mid, mid)
        self.conv2b = nn.Sequential(*[TLightConv3x3(mid, mid) for _ in range(2)])
        self.conv2c = nn.Sequential(*[TLightConv3x3(mid, mid) for _ in range(3)])
        self.conv2d = nn.Sequential(*[TLightConv3x3(mid, mid) for _ in range(4)])
        self.gate = TChannelGate(mid)
        self.conv3 = TConv(mid, c2, relu=False)
        self.downsample = TConv(c1, c2, relu=False) if c1 != c2 else None

    def forward(self, x):
        x1 = self.conv1(x)
        y = (
            self.gate(self.conv2a(x1))
            + self.gate(self.conv2b(x1))
            + self.gate(self.conv2c(x1))
            + self.gate(self.conv2d(x1))
        )
        x3 = self.conv3(y)
        identity = self.downsample(x) if self.downsample is not None else x
        return F.relu(x3 + identity)


class OSNetTorch(nn.Module):
    """torchreid attribute layout: conv1, maxpool, conv2/conv3 (2 blocks +
    transition), conv4 (2 blocks), conv5, fc(Linear+BN1d+ReLU)."""

    def __init__(self, variant="x0_25", feature_dim=512):
        super().__init__()
        ch = OSNET_VARIANTS[variant]
        self.conv1 = TConv(3, ch[0], 7, 2, 3, relu=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)

        def stage(c1, c2, transition):
            mods = [TOSBlock(c1, c2), TOSBlock(c2, c2)]
            if transition:
                mods.append(nn.Sequential(TConv(c2, c2, relu=True), nn.AvgPool2d(2, 2)))
            return nn.Sequential(*mods)

        self.conv2 = stage(ch[0], ch[1], True)
        self.conv3 = stage(ch[1], ch[2], True)
        self.conv4 = stage(ch[2], ch[3], False)
        self.conv5 = TConv(ch[3], ch[3], relu=True)
        self.fc = nn.Sequential(
            nn.Linear(ch[3], feature_dim), nn.BatchNorm1d(feature_dim), nn.ReLU()
        )

    def forward(self, x):
        x = self.maxpool(self.conv1(x))
        x = self.conv5(self.conv4(self.conv3(self.conv2(x))))
        y = self.fc(x.mean((2, 3)))
        return y / y.norm(dim=-1, keepdim=True).clamp_min(1e-12)


def randomize_(model: nn.Module, seed: int = 0) -> nn.Module:
    """Non-trivial random weights AND BatchNorm running stats (so a
    converter that drops running stats fails loudly)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (nn.Conv2d, nn.Linear)):
                fan_in = m.weight[0].numel()
                m.weight.normal_(0.0, (2.0 / fan_in) ** 0.5, generator=g)
                if m.bias is not None:
                    m.bias.normal_(0.0, 0.05, generator=g)
            elif isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
                m.running_mean.normal_(0.0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    # restore the frozen DFL projection if present
    for m in model.modules():
        if isinstance(m, UDetect):
            with torch.no_grad():
                m.dfl.conv.weight.copy_(
                    torch.arange(REG_MAX, dtype=torch.float32).view(1, REG_MAX, 1, 1)
                )
    return model.eval()
