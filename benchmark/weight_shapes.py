# Model weight shapes with TP pre-division applied (role of reference
# benchmark/weight_shapes.py + benchmark/src/get_model_config.py:17-302:
# "shapes pre-resolved with TP/EP division applied").
# Each entry: (K, N) per projection for tp=1; divide per tp at use site.

WEIGHT_SHAPES = {
    "llama-3-8b": {
        "qkv": (4096, 6144), "o": (4096, 4096),
        "gate_up": (4096, 28672), "down": (14336, 4096),
    },
    "llama-3-70b": {
        "qkv": (8192, 10240), "o": (8192, 8192),
        "gate_up": (8192, 57344), "down": (28672, 8192),
    },
    "qwen2-7b": {
        "qkv": (3584, 4608), "o": (3584, 3584),
        "gate_up": (3584, 37888), "down": (18944, 3584),
    },
    "mixtral-8x7b-expert": {
        "w13": (4096, 28672), "w2": (14336, 4096), "num_experts": 8,
    },
    "gpt-oss-20b-expert": {
        "w13": (2880, 5760), "w2": (2880, 2880), "num_experts": 32,
    },
    "gpt-oss-120b-expert": {
        "w13": (2880, 5760), "w2": (2880, 2880), "num_experts": 128,
    },
    "deepseek-v2-lite": {
        "qkv": (2048, 3072), "o": (2048, 2048),
        "moe_w13": (2048, 2816), "moe_w2": (1408, 2048),
        "num_experts": 64,
    },
}


def tp_divide(shapes: dict, tp: int) -> dict:
    out = {}
    for k, v in shapes.items():
        if k == "num_experts":
            out[k] = v
        elif k in ("qkv", "gate_up", "w13", "moe_w13"):
            out[k] = (v[0], v[1] // tp)
        else:
            out[k] = (v[0] // tp, v[1])
    return out
