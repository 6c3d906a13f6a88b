from .attention import AttentionDecoder
from .east import EASTModel
from .resnet import ResNetFeatures
from .rnn import BiLSTM
from .seresnet31 import SEResNet31
from .trba import TRBAModel
