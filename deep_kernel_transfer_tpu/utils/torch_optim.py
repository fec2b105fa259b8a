"""Optax transforms matching the torch optimizer configurations the
reference hard-codes, so finetuning dynamics are comparable.

reference meta_template.py:115 / baselinefinetune.py:37 / relationnet.py:52:
  torch.optim.SGD(lr=0.01, momentum=0.9, dampening=0.9, weight_decay=0.001)

torch SGD update:  v <- momentum * v + (1 - dampening) * (g + wd * p)
                   p <- p - lr * v
With momentum=0.9, dampening=0.9 the buffer is an EMA: v = 0.9 v + 0.1 g.
optax.trace(decay) computes v' = decay v' + g, so v = (1-dampening) * v'
and the update is lr * (1 - dampening) * v'.
"""
from __future__ import annotations

import optax


def torch_sgd(
    lr: float = 0.01,
    momentum: float = 0.9,
    dampening: float = 0.9,
    weight_decay: float = 0.001,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale(-(1.0 - dampening) * lr),
    )
