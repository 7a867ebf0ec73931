from .qp import QP
