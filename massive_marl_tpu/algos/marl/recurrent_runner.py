"""Recurrent MARL runner: MAPPO / IPPO / HAPPO with GRU policies.

The reference's recurrent path (`use_recurrent_policy`, actor_critic.py:35-36,
RNNLayer utils/rnn.py) stores per-step rnn states in the buffer and trains
with chunked-BPTT minibatch generators (separated_buffer.py:312-425,
`data_chunk_length`).  This runner implements exactly that:

  * `data_chunk_length` L splits each [T, E] rollout into (T//L)*E chunks;
    every update re-runs the GRU through an L-step chunk from the chunk-start
    hidden state recorded during the rollout (recurrent_generator semantics,
    separated_buffer.py:312-425).  L=None uses whole-episode chunks (L=T),
    the naive-recurrent special case.
  * `num_mini_batch` partitions the chunk axis per epoch with a fresh random
    permutation (chunks-of-chunks, like the reference generator).
  * value-target normalization uses the same per-algo PopArt/ValueNorm
    cadence as the feed-forward runner (nets.norm_targets).

Hidden states are zeroed at episode boundaries via masks = 1 - done
(runner.py:229-255 mask construction).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from massive_marl_tpu.envs.base import batched_step
from massive_marl_tpu.algos.marl import nets
from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner


@struct.dataclass
class RecurrentMarlTrainState:
    actor_params: Any
    critic_params: Any
    actor_opt: Any
    critic_opt: Any
    vnorm: Any
    actor_h: jnp.ndarray    # [E,N,H]
    critic_h: jnp.ndarray   # [E,N,H]
    env_state: Any
    key: jnp.ndarray
    iteration: jnp.ndarray
    # per-env episode-return accumulator (reference runner.py:145-163)
    ep_ret: Any = None
    last_ep_ret: Any = None
    ep_count: Any = None


class RecurrentMarlRunner(MarlRunner):
    def __init__(self, env, num_envs: int, cfg: MarlConfig | None = None,
                 seed: int = 0, log_dir: str | None = None, print_log: bool = True,
                 mesh=None):
        cfg = cfg or MarlConfig()
        self.H = cfg.hidden_size
        L = cfg.data_chunk_length
        if L is not None and cfg.episode_length % int(L) != 0:
            raise ValueError(
                f"data_chunk_length={L} must divide episode_length="
                f"{cfg.episode_length} (reference recurrent_generator slices "
                f"whole chunks, separated_buffer.py:312-425)")
        # build the recurrent nets FIRST, then reuse the parent's plumbing
        self._rnn_ready = False
        super().__init__(env, num_envs, cfg, seed, log_dir, print_log, mesh=mesh)
        c = self.cfg
        self.actor = nets.MarlActorRNN(act_dim=self.act_dim, hidden_size=c.hidden_size,
                                       layer_n=c.layer_n, gain=c.gain,
                                       std_x_coef=c.std_x_coef, std_y_coef=c.std_y_coef)
        self.critic = nets.MarlCriticRNN(hidden_size=c.hidden_size, layer_n=c.layer_n)
        self._rnn_ready = True
        self._train_iter = jax.jit(self._make_train_iter_rnn())

    # ------------------------------------------------------------------ setup
    def init_state(self) -> RecurrentMarlTrainState:
        key = jax.random.PRNGKey(self.seed)
        key, ka, kc, ke = jax.random.split(key, 4)
        E, N, H = self.num_envs, self.N, self.H
        h0 = jnp.zeros((1, H))
        m0 = jnp.ones((1,))
        actor_params = jax.vmap(
            lambda k: self.actor.init(k, jnp.zeros((1, self.obs_dim)), h0, m0)
        )(jax.random.split(ka, N))
        critic_params = jax.vmap(
            lambda k: self.critic.init(k, jnp.zeros((1, self.critic_in_dim)), h0, m0)
        )(jax.random.split(kc, N))
        env_state = jax.jit(jax.vmap(self.env.reset))(jax.random.split(ke, E))
        return RecurrentMarlTrainState(
            actor_params=actor_params, critic_params=critic_params,
            actor_opt=jax.vmap(self.actor_tx.init)(actor_params),
            critic_opt=jax.vmap(self.critic_tx.init)(critic_params),
            vnorm=jax.vmap(lambda _: nets.ValueNorm.create())(jnp.arange(N)),
            actor_h=jnp.zeros((E, N, H)), critic_h=jnp.zeros((E, N, H)),
            env_state=env_state, key=key, iteration=jnp.asarray(0, jnp.int32),
            ep_ret=jnp.zeros(E), last_ep_ret=jnp.zeros(E),
            ep_count=jnp.zeros(E, jnp.int32))

    # --------------------------------------------------------------- train it
    def _make_train_iter_rnn(self):
        cfg = self.cfg
        env = self.env
        N, E, T, H = self.N, self.num_envs, cfg.episode_length, self.H
        actor, critic = self.actor, self.critic
        env_step_fn = batched_step(env)
        if self.mesh is not None:
            # env batch sharded over 'data' (pallas kernel under shard_map);
            # the flax GRU/MLP learner auto-partitions around it
            from massive_marl_tpu.parallel.mesh import shard_env_step
            env_step_fn = shard_env_step(env_step_fn, self.mesh)
        actor_tx, critic_tx = self.actor_tx, self.critic_tx
        is_happo = cfg.algorithm_name in ("happo", "hatrpo")
        norm_mode = self.norm_mode
        L = int(cfg.data_chunk_length) if cfg.data_chunk_length else T
        n_chunks_t = T // L          # chunks per env along time
        C = n_chunks_t * E           # total chunks (the generator's batch axis)
        nmb = max(1, cfg.num_mini_batch)
        chunked = n_chunks_t > 1     # store per-step hiddens only when needed

        def act_all(ap, obs, h, mask):
            return jax.vmap(lambda p, o, hh, m: actor.apply(p, o, hh, m),
                            in_axes=(0, 1, 1, None), out_axes=1)(ap, obs, h, mask)

        def value_all(cp, cin, h, mask):
            return jax.vmap(lambda p, o, hh, m: critic.apply(p, o, hh, m),
                            in_axes=(0, 1, 1, None), out_axes=1)(cp, cin, h, mask)

        def rollout_step(carry, _):
            env_state, key, ap, cp, ah, ch = carry
            key, k = jax.random.split(key)
            mask = 1.0 - env_state.done.astype(jnp.float32)          # [E]
            obs_buf = jnp.clip(env_state.obs, -cfg.clip_obs, cfg.clip_obs)
            obs, cin = self._agent_views(obs_buf)
            mean, std, ah2 = act_all(ap, obs, ah, mask)
            actions = mean + std * jax.random.normal(k, mean.shape)
            logp = nets.normal_log_prob(mean, std, actions)
            values, ch2 = value_all(cp, cin, ch, mask)
            ns = env_step_fn(env_state,
                             jnp.clip(actions, -cfg.clip_actions,
                                      cfg.clip_actions).reshape(E, -1))
            data = dict(obs=obs, share=obs_buf, actions=actions, logp=logp,
                        values=values, mask=mask, reward=ns.reward,
                        done=ns.done.astype(jnp.float32))
            if chunked:
                # pre-step hiddens: chunk-start states for the BPTT generator
                # (the reference buffer's rnn_states[t], separated_buffer.py:44-50)
                data["ah"] = ah
                data["ch"] = ch
            return (ns, key, ap, cp, ah2, ch2), data

        def denorm(vn, x):
            return vn.denormalize(x) if norm_mode != "none" else x

        def gae_one_agent(values, rewards, dones, last_value, vn):
            v_den = denorm(vn, values)
            last_den = denorm(vn, last_value)

            def back(adv, x):
                r, d, v, nv = x
                delta = r + cfg.gamma * nv * (1 - d) - v
                adv = delta + cfg.gamma * cfg.gae_lambda * (1 - d) * adv
                return adv, adv

            nvs = jnp.concatenate([v_den[1:], last_den[None]], axis=0)
            _, adv = jax.lax.scan(back, jnp.zeros(E), (rewards, dones, v_den, nvs),
                                  reverse=True)
            returns = adv + v_den
            return (adv - adv.mean()) / (adv.std() + 1e-5), returns

        def to_chunks(x):
            """[T, E, ...] -> [L, C, ...]: split time into whole chunks and
            fold the chunk index into the batch axis."""
            x = x.reshape(n_chunks_t, L, E, *x.shape[2:])
            return jnp.swapaxes(x, 0, 1).reshape(L, C, *x.shape[3:])

        def chunk_starts(h_seq, h_roll0):
            """Chunk-start hiddens [C, H] from per-step hiddens [T, E, H]
            (h_seq[0] equals the rollout-start state h_roll0)."""
            if not chunked:
                return h_roll0
            return h_seq[::L].reshape(C, H)

        def actor_seq_logp(params, obs_seq, act_seq, mask_seq, h0):
            """Recompute logp through the GRU chain: obs_seq [L,B,obs]."""
            def step(h, x):
                o, a, m = x
                mean, std, h = actor.apply(params, o, h, m)
                return h, (nets.normal_log_prob(mean, std, a),
                           nets.normal_entropy(std))
            _, (logp, ent) = jax.lax.scan(step, h0, (obs_seq, act_seq, mask_seq))
            return logp, ent  # [L,B]

        def critic_seq(params, cin_seq, mask_seq, h0):
            def step(h, x):
                o, m = x
                v, h = critic.apply(params, o, h, m)
                return h, v
            _, v = jax.lax.scan(step, h0, (cin_seq, mask_seq))
            return v

        def update_once(carry, data):
            """One gradient step on one minibatch of chunks.  data leaves:
            sequences [L, B, ...] plus chunk-start hiddens ah0/ch0 [B, H]
            and factor [L, B]."""
            ap, ao, cp, co, vn = carry

            def actor_loss(p):
                logp, ent = actor_seq_logp(p, data["obs"], data["actions"],
                                           data["mask"], data["ah0"])
                ratio = jnp.exp(logp - data["logp"])
                surr1 = ratio * data["adv"]
                surr2 = jnp.clip(ratio, 1 - cfg.clip_param, 1 + cfg.clip_param) * data["adv"]
                loss = -jnp.mean(data["factor"] * jnp.minimum(surr1, surr2))
                return loss - cfg.entropy_coef * ent.mean(), loss

            def critic_loss(p, rn_clip, rn_orig):
                v = critic_seq(p, data["cin"], data["mask"], data["ch0"])
                v_clip = data["values"] + jnp.clip(v - data["values"],
                                                   -cfg.clip_param, cfg.clip_param)
                err_o = rn_orig - v
                err_c = rn_clip - v_clip
                if cfg.use_huber_loss:
                    l_o = nets.huber(err_o, cfg.huber_delta)
                    l_c = nets.huber(err_c, cfg.huber_delta)
                else:
                    l_o, l_c = 0.5 * err_o**2, 0.5 * err_c**2
                l = jnp.maximum(l_o, l_c) if cfg.use_clipped_value_loss else l_o
                return cfg.value_loss_coef * l.mean(), l.mean()

            (al, aloss), ag = jax.value_and_grad(actor_loss, has_aux=True)(ap)
            if hasattr(actor_tx, "update_apply"):   # fused clip+Adam+apply
                ap, ao = actor_tx.update_apply(ag, ao, ap)
            else:
                au, ao = actor_tx.update(ag, ao, ap)
                ap = optax.apply_updates(ap, au)
            vn, rn_c, rn_o = nets.norm_targets(vn, data["returns"], norm_mode)
            (cl, vloss), cg = jax.value_and_grad(critic_loss, has_aux=True)(
                cp, rn_c, rn_o)
            if hasattr(critic_tx, "update_apply"):
                cp, co = critic_tx.update_apply(cg, co, cp)
            else:
                cu, co = critic_tx.update(cg, co, cp)
                cp = optax.apply_updates(cp, cu)
            return (ap, ao, cp, co, vn), (aloss, vloss)

        def agent_update(key, ap, ao, cp, co, vn, data):
            """ppo_epoch x num_mini_batch chunked-BPTT updates for one agent.
            data: sequences [L, C, ...] + ah0/ch0 [C, H] + factor [L, C]."""
            if nmb == 1:
                def one_epoch(carry, _):
                    return update_once(carry, data)
                (ap, ao, cp, co, vn), (al, vl) = jax.lax.scan(
                    one_epoch, (ap, ao, cp, co, vn), None, length=cfg.ppo_epoch)
            else:
                mb = C // nmb

                def one_epoch(carry, k):
                    idx = jax.random.permutation(k, C)[: nmb * mb].reshape(nmb, mb)

                    def one_mb(c2, ix):
                        mbd = {k2: (v[ix] if k2 in ("ah0", "ch0") else v[:, ix])
                               for k2, v in data.items()}
                        return update_once(c2, mbd)
                    carry, (al, vl) = jax.lax.scan(one_mb, carry, idx)
                    return carry, (al.mean(), vl.mean())
                (ap, ao, cp, co, vn), (al, vl) = jax.lax.scan(
                    one_epoch, (ap, ao, cp, co, vn),
                    jax.random.split(key, cfg.ppo_epoch))
            return ap, ao, cp, co, vn, al.mean(), vl.mean()

        def train_iter(ts: RecurrentMarlTrainState):
            ah0_all, ch0_all = ts.actor_h, ts.critic_h        # [E,N,H]
            (env_state, key, _, _, ah, ch), traj = jax.lax.scan(
                rollout_step,
                (ts.env_state, ts.key, ts.actor_params, ts.critic_params,
                 ts.actor_h, ts.critic_h), None, length=T)
            last_buf = jnp.clip(env_state.obs, -cfg.clip_obs, cfg.clip_obs)
            _, last_cin = self._agent_views(last_buf)
            last_mask = 1.0 - env_state.done.astype(jnp.float32)
            last_values, _ = value_all(ts.critic_params, last_cin, ch, last_mask)

            adv, returns = jax.vmap(gae_one_agent, in_axes=(2, None, None, 1, 0),
                                    out_axes=2)(
                traj["values"], traj["reward"], traj["done"], last_values, ts.vnorm)

            share_seq = traj["share"]                        # [T,E,share]
            mask_chunks = to_chunks(traj["mask"])            # [L,C]

            def agent_data(i):
                g = lambda x: jax.lax.dynamic_index_in_dim(x, i, axis=2, keepdims=False)
                obs_i = g(traj["obs"])
                cin_i = share_seq if cfg.use_centralized_v else obs_i
                ah_seq = g(traj["ah"]) if chunked else None   # [T,E,H]
                ch_seq = g(traj["ch"]) if chunked else None
                return dict(obs=to_chunks(obs_i), cin=to_chunks(cin_i),
                            actions=to_chunks(g(traj["actions"])),
                            logp=to_chunks(g(traj["logp"])),
                            values=to_chunks(g(traj["values"])),
                            adv=to_chunks(g(adv)), returns=to_chunks(g(returns)),
                            mask=mask_chunks,
                            ah0=chunk_starts(ah_seq,
                                             jax.lax.dynamic_index_in_dim(ah0_all, i, 1, False)),
                            ch0=chunk_starts(ch_seq,
                                             jax.lax.dynamic_index_in_dim(ch0_all, i, 1, False)))

            key, k_mb = jax.random.split(key)
            if not is_happo:
                def upd(k, ap, ao, cp, co, vn, i):
                    data = agent_data(i)
                    data["factor"] = jnp.ones((L, C))
                    return agent_update(k, ap, ao, cp, co, vn, data)
                ap, ao, cp, co, vn, alosses, vlosses = jax.vmap(upd)(
                    jax.random.split(k_mb, N),
                    ts.actor_params, ts.actor_opt, ts.critic_params,
                    ts.critic_opt, ts.vnorm, jnp.arange(N))
            else:
                key, kp = jax.random.split(key)
                perm = jax.random.permutation(kp, N)

                def happo_agent(carry, x):
                    i, k_ep = x
                    ap_all, ao_all, cp_all, co_all, vn_all, factor = carry
                    gi = lambda t: jax.tree_util.tree_map(
                        lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, False), t)
                    si = lambda t, nw: jax.tree_util.tree_map(
                        lambda x, nx: jax.lax.dynamic_update_index_in_dim(x, nx, i, 0),
                        t, nw)
                    ap, ao, cp, co, vn = (gi(ap_all), gi(ao_all), gi(cp_all),
                                          gi(co_all), gi(vn_all))
                    data = agent_data(i)
                    data["factor"] = factor                   # [L,C]
                    # the factor logps run over chunked sequences from the
                    # true chunk-start hiddens - exact, chunked or not
                    old_logp, _ = actor_seq_logp(ap, data["obs"], data["actions"],
                                                 data["mask"], data["ah0"])
                    ap, ao, cp, co, vn, al, vl = agent_update(k_ep, ap, ao, cp, co,
                                                              vn, data)
                    new_logp, _ = actor_seq_logp(ap, data["obs"], data["actions"],
                                                 data["mask"], data["ah0"])
                    factor = factor * jnp.exp(new_logp - old_logp)
                    return (si(ap_all, ap), si(ao_all, ao), si(cp_all, cp),
                            si(co_all, co), si(vn_all, vn), factor), (al, vl)

                init = (ts.actor_params, ts.actor_opt, ts.critic_params,
                        ts.critic_opt, ts.vnorm, jnp.ones((L, C)))
                (ap, ao, cp, co, vn, _), (alosses, vlosses) = jax.lax.scan(
                    happo_agent, init, (perm, jax.random.split(k_mb, N)))

            def ep_step(c, x):
                ep, last, cnt = c
                r, d = x
                ep = ep + r
                fin = d > 0
                last = jnp.where(fin, ep, last)
                cnt = cnt + fin.astype(jnp.int32)
                return (jnp.where(fin, 0.0, ep), last, cnt), None

            (ep_ret, last_ep, ep_cnt), _ = jax.lax.scan(
                ep_step, (ts.ep_ret, ts.last_ep_ret, ts.ep_count),
                (traj["reward"], traj["done"]))
            have = ep_cnt > 0
            metrics = dict(mean_reward=traj["reward"].mean(),
                           value_loss=vlosses.mean(), policy_loss=alosses.mean(),
                           done_frac=traj["done"].mean(),
                           episode_rewards=jnp.sum(jnp.where(have, last_ep, 0.0))
                           / jnp.maximum(1, have.sum()),
                           episodes_done=have.sum())
            return RecurrentMarlTrainState(
                actor_params=ap, critic_params=cp, actor_opt=ao, critic_opt=co,
                vnorm=vn, actor_h=ah, critic_h=ch, env_state=env_state, key=key,
                iteration=ts.iteration + 1,
                ep_ret=ep_ret, last_ep_ret=last_ep, ep_count=ep_cnt), metrics

        return train_iter

    def eval(self, n_episodes: int | None = None, deterministic: bool = True):
        """Episode-faithful recurrent eval: fresh-reset eval envs, zero
        hidden states (reference eval_rnn_states init, runner.py:361-363),
        mean first-episode return."""
        if self.state is None:
            self.state = self.init_state()
        cfg = self.cfg
        n_episodes = n_episodes or cfg.eval_episodes
        E_ev = max(1, min(n_episodes, self.num_envs))
        horizon = int(getattr(self.env, "max_episode_length", 1000))
        fn = self._eval_fns.get(E_ev)
        if fn is None:
            def step(carry, _):
                st, ah, ret, alive, ap = carry
                mask = 1.0 - st.done.astype(jnp.float32)
                obs, _ = self._agent_views(jnp.clip(st.obs, -cfg.clip_obs, cfg.clip_obs))
                mean, _, ah = jax.vmap(lambda p, o, h, m: self.actor.apply(p, o, h, m),
                                       in_axes=(0, 1, 1, None), out_axes=1)(
                    ap, obs, ah, mask)
                st = batched_step(self.env)(
                    st, jnp.clip(mean, -1, 1).reshape(E_ev, -1))
                ret = ret + jnp.where(alive, st.reward, 0.0)
                alive = alive & ~st.done
                return (st, ah, ret, alive, ap), None

            def run_eval(key, ap):
                st = jax.vmap(self.env.reset)(jax.random.split(key, E_ev))
                ah = jnp.zeros((E_ev, self.N, self.H))
                (_, _, ret, _, _), _ = jax.lax.scan(
                    step, (st, ah, jnp.zeros(E_ev), jnp.ones(E_ev, bool), ap),
                    None, length=horizon)
                return ret.mean()

            fn = jax.jit(run_eval)
            self._eval_fns[E_ev] = fn
        # iteration folded in so each periodic eval draws fresh initial states
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed + 10_000),
                                 jnp.asarray(self.state.iteration, jnp.int32))
        return float(fn(key, self.state.actor_params))
