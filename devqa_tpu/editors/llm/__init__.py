"""Text-LLM editing algorithms — the EasyEdit-stack zoo
(``easyeditor/models/``): ROME, GRACE, LoRA, FT over this framework's
decoders, plus the BaseEditor-style editing session."""
from .session import LLMEditSession, EditRequestText  # noqa: F401
from .rome import ROMEHyperParams, apply_rome  # noqa: F401
from .memit import MEMITHyperParams, apply_memit  # noqa: F401
from .kn import KNHyperParams, apply_kn  # noqa: F401
from .grace import GRACEHyperParams, GraceEditor  # noqa: F401
from .lora import LoRAHyperParams, apply_lora  # noqa: F401
from .ft import FTHyperParams, apply_ft  # noqa: F401
from .ft_api import FTApiHyperParams, apply_ft_api  # noqa: F401
from .oracle import OracleHyperParams, oracle_rank1_ttt  # noqa: F401
from .mend import MENDText, MENDTextTrainable  # noqa: F401


def alg_dict():
    """Name → (HyperParams class, apply fn) for the pure-functional
    text algorithms (``easyeditor/util/alg_dict.py`` ALG_DICT role —
    stateful algorithms GRACE/MEND are classes, see GraceEditor /
    MENDText; IKE/SERAC live on the multimodal side)."""
    return {
        "ROME": (ROMEHyperParams, apply_rome),
        "MEMIT": (MEMITHyperParams, apply_memit),
        "KN": (KNHyperParams, apply_kn),
        "FT": (FTHyperParams, apply_ft),
        "FT-Api": (FTApiHyperParams, apply_ft_api),
        "LoRA": (LoRAHyperParams, apply_lora),
    }
