from . import rules, common, primal_dual, backtracking, nesterov, agraal, malitsky_pock, adapdm_plus, auto
